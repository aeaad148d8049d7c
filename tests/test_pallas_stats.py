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


def test_stats_kernel_unencoded_fallback():
    """Rows too wide for the exact-integer encoding (M_enc None, e.g.
    T2=4096 where (T2-1)*M leaves f32's 2^24 range) take the
    select-chain _last_valid_scan — reachable in production (the shape
    fits VMEM) and must match the scan like the encoded path."""
    from abnet3_tpu.ops.pallas_dtw import _last_valid_encode_limit
    assert _last_valid_encode_limit(16, 4096) is None
    assert stats_fits_vmem(8, 16, 4096)
    dist, n1, n2 = _random_case(11, 8, 16, 4096)
    p0, l0 = dtw_path_stats(dist, n1, n2)
    p1, l1 = dtw_path_stats_pallas(dist, n1, n2, interpret=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-4, atol=1e-4)


def test_checkpoint_pins_stats_backend(tmp_path, monkeypatch):
    """A layout-compatible checkpoint forces its recorded stats
    backend on resume: tiles computed the other way are never mixed
    in, and a backend the resume can't honor refuses LOUDLY instead of
    truncating the memmap (review finding: a transient probe failure
    or env flip used to read as 'stale layout' and zero hours of
    tiles)."""
    import jax
    import abnet3_tpu.eval.abx as abx
    from abnet3_tpu.ops.bank import TokenBank

    rng = np.random.RandomState(12)
    feats = {i: rng.randn(rng.randint(6, 13), 8).astype(np.float32)
             for i in range(48)}
    bank = TokenBank(feats)
    ck = str(tmp_path / "ck")
    D1 = abx.distance_matrix(bank, "dtw_cos", strategy="tiles",
                             batch_size=16, checkpoint_path=ck)
    import json
    prog = json.load(open(ck + ".tiles.json"))
    assert prog["algo"] == "path-stats"  # scan flavor on CPU
    # resume under env that WOULD pick pallas had the run been fresh:
    # the pin must keep the scan backend (no truncation, same matrix)
    monkeypatch.setenv("ABNET3_PALLAS_TILES_MIN", "0")
    assert abx._checkpoint_pinned_algo(
        ck, {k: prog[k] for k in ("N", "block", "dtype", "distance",
                                  "max_frames", "T", "wire")}) \
        == "path-stats"
    D2 = abx.distance_matrix(bank, "dtw_cos", strategy="tiles",
                             batch_size=16, checkpoint_path=ck)
    np.testing.assert_array_equal(D2, D1)
    # a pallas-flavor checkpoint that this run cannot honor must raise
    prog["algo"] = "path-stats-pallas"
    json.dump(prog, open(ck + ".tiles.json", "w"))
    monkeypatch.setenv("ABNET3_PALLAS_DTW", "0")
    with pytest.raises(RuntimeError, match="Pallas stats backend"):
        abx.distance_matrix(bank, "dtw_cos", strategy="tiles",
                            batch_size=16, checkpoint_path=ck)
    # and the refusal left the checkpoint intact
    assert json.load(open(ck + ".tiles.json"))["done"]


def test_anchor_distance_rows_match_pairwise():
    """anchor_*_distance_rows == the batched pairwise distances of the
    broadcast anchor, transposed (the ABX tile rows' fast layout)."""
    from abnet3_tpu.ops.dtw import (anchor_angular_distance_rows,
                                    anchor_kl_distance_rows,
                                    pairwise_angular_distance,
                                    pairwise_kl_distance)
    rng = np.random.RandomState(7)
    B, T1, T2, d = 6, 10, 14, 8
    xa = rng.randn(T1, d).astype(np.float32)
    y = rng.randn(B, T2, d).astype(np.float32)
    xa[3] = 0.0   # zero-norm anchor frame
    y[2, 5] = 0.0  # zero-norm column frame
    ref = pairwise_angular_distance(
        jnp.broadcast_to(jnp.asarray(xa)[None], (B, T1, d)),
        jnp.asarray(y))
    out = anchor_angular_distance_rows(jnp.asarray(xa), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(np.asarray(ref), 1, 0),
                               rtol=1e-6, atol=1e-6)
    # zero-norm rules exact: 1 vs everything, 0 vs other zero frames
    o = np.asarray(out)
    assert o[3, 2, 5] == 0.0 and o[3, 0, 0] == 1.0 and o[0, 2, 5] == 1.0

    pg = np.abs(rng.rand(T1, d)).astype(np.float32)
    qg = np.abs(rng.rand(B, T2, d)).astype(np.float32)
    ref_kl = pairwise_kl_distance(
        jnp.broadcast_to(jnp.asarray(pg)[None], (B, T1, d)),
        jnp.asarray(qg))
    out_kl = anchor_kl_distance_rows(jnp.asarray(pg), jnp.asarray(qg))
    np.testing.assert_allclose(np.asarray(out_kl),
                               np.moveaxis(np.asarray(ref_kl), 1, 0),
                               rtol=1e-5, atol=1e-6)


def test_rows_route_matches_tile_row_math():
    """The ABX tile's pallas rows branch (anchor einsum + rows kernel)
    computes the same normalized distances as the scan branch's
    broadcast + batched stats route (eval/abx.py tile_impl)."""
    from abnet3_tpu.ops.dtw import (anchor_angular_distance_rows,
                                    pairwise_angular_distance)
    from abnet3_tpu.ops.pallas_dtw import dtw_path_stats_rows_pallas
    rng = np.random.RandomState(8)
    block, T, d = 16, 12, 8
    fa = jnp.asarray(rng.randn(T, d).astype(np.float32))
    fj = jnp.asarray(rng.randn(block, T, d).astype(np.float32))
    na = 10
    nj = jnp.asarray(rng.randint(4, T + 1, block), jnp.int32)
    # scan branch
    dist = pairwise_angular_distance(
        jnp.broadcast_to(fa[None], (block, T, d)), fj)
    p0, l0 = dtw_path_stats(dist, jnp.full((block,), na, jnp.int32), nj)
    # rows branch
    rows = anchor_angular_distance_rows(fa, fj)
    p1, l1 = dtw_path_stats_rows_pallas(
        rows, jnp.full((block,), na, jnp.int32), nj, interpret=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_allclose(np.asarray(p1) / np.asarray(l1),
                               np.asarray(p0) / np.asarray(l0),
                               rtol=1e-5, atol=1e-5)


def test_rows_sharded_matches_single_device():
    from abnet3_tpu.parallel import make_mesh
    from abnet3_tpu.ops.pallas_dtw import (
        dtw_path_stats_rows_pallas, dtw_path_stats_rows_pallas_sharded)
    dist, n1, n2 = _random_case(9, 16, 12, 20)
    rows = jnp.moveaxis(dist, 1, 0)
    p0, l0 = dtw_path_stats_rows_pallas(rows, n1, n2, interpret=True)
    for mesh in (make_mesh(n_data=8, n_model=1),
                 make_mesh(n_data=4, n_model=2)):
        p1, l1 = dtw_path_stats_rows_pallas_sharded(rows, n1, n2, mesh,
                                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-6, atol=1e-6)


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
