"""Model registry module (API parity with the reference's ``abnet3.model``).

The gridsearch YAML resolves model classes by name from this module
(reference gridsearch.py:161-166); implementations live in
:mod:`abnet3_tpu.models`.
"""

from abnet3_tpu.models import (  # noqa: F401
    MultimodalSiameseNetwork,
    NetworkBuilder,
    SiameseMultitaskNetwork,
    SiameseNetwork,
)

__all__ = ["NetworkBuilder", "SiameseNetwork", "SiameseMultitaskNetwork",
           "MultimodalSiameseNetwork"]
