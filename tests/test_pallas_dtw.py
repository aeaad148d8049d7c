"""Pallas DTW DP kernel vs the XLA row scan (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from abnet3_tpu.ops.dtw import dtw_costs
from abnet3_tpu.ops.pallas_dtw import BLOCK_B, dtw_costs_pallas


@pytest.mark.parametrize("shape", [(3, 16, 24), (8, 32, 32), (9, 8, 128)])
def test_pallas_matches_scan(shape):
    rng = np.random.RandomState(0)
    dist = rng.rand(*shape).astype(np.float32)
    D0 = np.asarray(dtw_costs(jnp.asarray(dist)))
    D1 = np.asarray(dtw_costs_pallas(jnp.asarray(dist), interpret=True))
    np.testing.assert_allclose(D1, D0, rtol=1e-4, atol=1e-4)


def test_pallas_batch_padding():
    """B not a multiple of BLOCK_B gets padded internally and sliced."""
    rng = np.random.RandomState(1)
    dist = rng.rand(BLOCK_B + 3, 16, 16).astype(np.float32)
    D1 = np.asarray(dtw_costs_pallas(jnp.asarray(dist), interpret=True))
    assert D1.shape == dist.shape
