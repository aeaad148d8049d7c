"""Model zoo: siamese towers, multitask and multimodal variants."""

from abnet3_tpu.models.siamese import (  # noqa: F401
    NetworkBuilder,
    SiameseNetwork,
    SiameseMultitaskNetwork,
)
from abnet3_tpu.models.multimodal import MultimodalSiameseNetwork  # noqa: F401
