from abnet3_tpu.eval.abx import (abx_error, distance_matrix,  # noqa: F401
                                 evaluate, make_pair_distance_fn)
