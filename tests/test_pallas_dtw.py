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


@pytest.mark.parametrize("shape", [(3, 16, 24), (8, 32, 32), (9, 8, 128)])
def test_pallas_moves_match_xla(shape):
    """Fused DP+move kernel emits exactly the XLA move matrix."""
    from abnet3_tpu.ops.dtw import moves_from_costs
    from abnet3_tpu.ops.pallas_dtw import dtw_moves_pallas
    rng = np.random.RandomState(2)
    dist = rng.rand(*shape).astype(np.float32)
    m0 = np.asarray(moves_from_costs(dtw_costs(jnp.asarray(dist))))
    m1 = np.asarray(dtw_moves_pallas(jnp.asarray(dist), interpret=True))
    assert m1.dtype == np.int8
    np.testing.assert_array_equal(m1, m0)


def test_moves_auto_flag(monkeypatch):
    """dtw_moves_auto honors ABNET3_PALLAS_DTW (interpret-safe on CPU the
    flag stays off; here we just check the default path equivalence)."""
    from abnet3_tpu.ops.dtw import dtw_moves_auto, moves_from_costs
    rng = np.random.RandomState(3)
    dist = jnp.asarray(rng.rand(4, 16, 16).astype(np.float32))
    monkeypatch.delenv("ABNET3_PALLAS_DTW", raising=False)
    np.testing.assert_array_equal(
        np.asarray(dtw_moves_auto(dist)),
        np.asarray(moves_from_costs(dtw_costs(dist))))
