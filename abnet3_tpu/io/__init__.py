"""IO layer: h5features-compatible container + text-format parsers."""

from abnet3_tpu.io.h5f import (  # noqa: F401
    H5FeaturesData,
    iter_h5features,
    read_h5features,
    read_h5features_index,
    read_h5features_item,
    write_h5features,
)
