"""Device compute ops: batched DTW alignment, distances, DSP front-end."""

from abnet3_tpu.ops.dtw import (  # noqa: F401
    align_diff_batch,
    dtw_align_batch,
    dtw_backtrace,
    dtw_costs,
    gather_aligned,
    pairwise_angular_distance,
)
