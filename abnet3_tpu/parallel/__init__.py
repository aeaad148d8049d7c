"""Multi-chip scaling: device meshes, shardings, fused sharded train step."""

from abnet3_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_frame_train_step,
    make_fused_train_step,
    make_pair_train_step,
    make_split_pair_train_step,
    make_sampled_train_step,
    make_sampled_eval_step,
    param_shardings,
    shard_array,
    use_matrix_loss,
)
