"""Pallas forward-only path-stats kernel vs the XLA scan and the
mask-route oracle (interpret mode on CPU).

The kernel (ops/pallas_dtw.py dtw_path_stats_pallas) is the ABX
distance tiles' inner loop: (psum, plen) of the DTW backtrace path with
no (B, T1, T2) materialization. Contract: plen bitwise-equal to
ops.dtw.dtw_path_stats (integer chain arithmetic, order-exact min/max);
psum equal to float summation-order rounding (the kernel's log-doubling
prefix sums add in a different order than the scan's cumsum).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from abnet3_tpu.ops.dtw import (dtw_costs, dtw_path_stats,
                                moves_from_costs, onpath_from_moves,
                                path_stats_backend)
from abnet3_tpu.ops.pallas_dtw import (dtw_path_stats_pallas,
                                       dtw_path_stats_pallas_sharded,
                                       stats_fits_vmem)


def _random_case(seed, B, T1, T2):
    rng = np.random.RandomState(seed)
    dist = jnp.asarray(rng.rand(B, T1, T2).astype(np.float32))
    n1 = jnp.asarray(rng.randint(1, T1 + 1, B), jnp.int32)
    n2 = jnp.asarray(rng.randint(1, T2 + 1, B), jnp.int32)
    return dist, n1, n2


@pytest.mark.parametrize("shape", [(3, 16, 24), (8, 32, 32),
                                   (9, 8, 128), (70, 33, 47)])
def test_stats_kernel_matches_scan(shape):
    dist, n1, n2 = _random_case(0, *shape)
    p0, l0 = dtw_path_stats(dist, n1, n2)
    p1, l1 = dtw_path_stats_pallas(dist, n1, n2, interpret=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(3, 16, 24), (13, 24, 40)])
def test_stats_kernel_matches_mask_oracle(shape):
    """psum/plen == the masked reductions over the full on-path mask
    (the route the stats DP replaced)."""
    dist, n1, n2 = _random_case(1, *shape)
    A = onpath_from_moves(moves_from_costs(dtw_costs(dist)), n1, n2)
    p0 = jnp.sum(A * dist, axis=(1, 2))
    l0 = jnp.sum(A, axis=(1, 2))
    p1, l1 = dtw_path_stats_pallas(dist, n1, n2, interpret=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-5, atol=1e-5)


def test_stats_kernel_tie_breaking_exact():
    """Quantized distances force frequent DP ties AND make every float
    sum exact (multiples of 0.5), so scan and kernel must agree
    BITWISE on both stats — any tie-resolution drift would show."""
    rng = np.random.RandomState(2)
    B, T1, T2 = 16, 24, 24
    dist = jnp.asarray(
        rng.choice([0.0, 0.5, 1.0], (B, T1, T2)).astype(np.float32))
    n1 = jnp.asarray(rng.randint(1, T1 + 1, B), jnp.int32)
    n2 = jnp.asarray(rng.randint(1, T2 + 1, B), jnp.int32)
    p0, l0 = dtw_path_stats(dist, n1, n2)
    p1, l1 = dtw_path_stats_pallas(dist, n1, n2, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))


def test_stats_kernel_long_sequences():
    """The kernel streams (B, T2) rows, so T1 only sets the DMA loop
    length and wide/long shapes the batch-chunked layouts couldn't fit
    now run: long T1 (many double-buffer iterations) and T2 past one
    lane tile (column padding + wider log-doubling chains)."""
    for seed, shape in ((5, (8, 200, 24)), (6, (8, 16, 300))):
        dist, n1, n2 = _random_case(seed, *shape)
        p0, l0 = dtw_path_stats(dist, n1, n2)
        p1, l1 = dtw_path_stats_pallas(dist, n1, n2, interpret=True)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-5)


def test_stats_vmem_guard():
    """Everything on-chip is (B, T2)-shaped: long-T buckets fit (only
    the row width matters), too-wide batches don't -> guard False,
    kernel raises, dispatchers take the XLA scan
    (ops.dtw.dtw_path_stats_auto)."""
    assert stats_fits_vmem(1024, 96, 128)   # the ABX tile row shape
    assert stats_fits_vmem(8, 2048, 2048)   # long buckets now fit
    assert not stats_fits_vmem(4096, 96, 128)
    dist = jnp.zeros((4096, 4, 128), jnp.float32)
    n = jnp.ones((4096,), jnp.int32)
    with pytest.raises(ValueError, match="VMEM"):
        dtw_path_stats_pallas(dist, n, n, interpret=True)


def test_stats_backend_on_cpu_is_scan():
    """On the CPU test backend the probe fails -> dispatch stays on the
    XLA scan (the production TPU default flips to 'pallas')."""
    assert path_stats_backend((1024, 96, 96)) == "scan"


def test_stats_sharded_matches_single_device():
    from abnet3_tpu.parallel import make_mesh
    dist, n1, n2 = _random_case(4, 16, 12, 20)
    p0, l0 = dtw_path_stats_pallas(dist, n1, n2, interpret=True)
    for mesh in (make_mesh(n_data=8, n_model=1),
                 make_mesh(n_data=4, n_model=2)):
        p1, l1 = dtw_path_stats_pallas_sharded(dist, n1, n2, mesh,
                                               interpret=True)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-6, atol=1e-6)
