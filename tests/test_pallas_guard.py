"""VMEM guard on the Pallas DTW kernels (VERDICT round-2 weak #3).

The bank bucket ladder advertises buckets up to 4096 frames
(dataloader.py ladder); a (block, T, T) f32 plane at T=2048 is ~16 MB
per pair per buffer — no batch block fits VMEM. The dispatchers in
ops/dtw.py must detect that at trace time and take the XLA scan instead
of handing Mosaic an uncompilable pallas_call.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from abnet3_tpu.ops import pallas_dtw
from abnet3_tpu.ops.dtw import (dtw_align_from_dist, dtw_costs,
                                dtw_path_from_dist, moves_from_costs,
                                onpath_from_moves, pairwise_angular_distance,
                                walk_moves)
from abnet3_tpu.ops.pallas_dtw import (_pick_block, dtw_path_pallas,
                                       fits_vmem)


def test_pick_block_unchanged_for_train_shapes():
    # the production bucket (B=64, T=96..128) keeps its large block
    assert _pick_block(64, 96, 96, n_buffers=3) == 64
    assert _pick_block(64, 128, 128, n_buffers=2) == 64
    # small batches still pad up to BLOCK_B
    assert _pick_block(1, 96, 96, n_buffers=3) == 8


def test_pick_block_shrinks_then_rejects():
    # T=512, 3 buffers: 3 MB/pair tiled -> block 2 fits the budget
    assert _pick_block(64, 512, 512, n_buffers=3) == 2
    # T=1024: 12 MB/pair tiled -> over the budget, nothing fits
    assert _pick_block(64, 1024, 1024, n_buffers=3) is None
    assert _pick_block(8, 2048, 2048, n_buffers=2) is None
    assert fits_vmem(64, 512, 512)
    assert not fits_vmem(64, 2048, 2048)


def test_direct_kernel_call_raises_loudly():
    dist = jnp.zeros((1, 2048, 2048), jnp.float32)
    n = jnp.ones((1,), jnp.int32)
    with pytest.raises(ValueError, match="VMEM"):
        dtw_path_pallas(dist, n, n, interpret=True)


def test_oversized_bucket_falls_back_to_scan():
    """A T=2048 bucket runs through both dispatchers without touching
    Pallas (on CPU the scan is the only path anyway; the point is the
    fits_vmem guard keeps it that way on TPU too — same code path)."""
    T = 2048
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(1, T, 4).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, T, 4).astype(np.float32))
    n1 = jnp.asarray([T // 2], jnp.int32)
    n2 = jnp.asarray([T // 3], jnp.int32)
    dist = pairwise_angular_distance(f1, f2)
    p1, p2, plen = dtw_align_from_dist(dist, n1, n2)
    A = dtw_path_from_dist(dist, n1, n2)
    # the mask marks exactly the backtraced path cells
    L = int(plen[0])
    assert float(A[0].sum()) == L
    assert bool(A[0, np.asarray(p1[0, :L]), np.asarray(p2[0, :L])].all())


def test_shrunk_block_interpret_parity(monkeypatch):
    """A tight VMEM budget forces block < BLOCK_B; the kernel output
    must still match the XLA path (interpret mode on CPU)."""
    B, T = 5, 64
    rng = np.random.RandomState(1)
    dist = jnp.asarray(rng.rand(B, T, T).astype(np.float32))
    n1 = jnp.asarray(rng.randint(T // 2, T + 1, B), jnp.int32)
    n2 = jnp.asarray(rng.randint(T // 2, T + 1, B), jnp.int32)
    import jax
    want = np.asarray(onpath_from_moves(
        moves_from_costs(dtw_costs(dist)), n1, n2))
    # tiled per-pair: 64 x 128 lanes x 4 B x 3 buffers = 96 KB
    # (+8 KB of length refs in the kernel call); 220 KB budget -> block 2.
    # _pick_block runs at trace time, so the jit cache must be dropped
    # for the new budget to take effect on an already-traced shape.
    monkeypatch.setattr(pallas_dtw, "VMEM_BUDGET", 220 * 1024)
    assert _pick_block(B, T, T, n_buffers=3) == 2
    jax.clear_caches()
    got = np.asarray(dtw_path_pallas(dist, n1, n2, interpret=True))
    np.testing.assert_array_equal(got, want)
    # block-1 path too (the last-resort block)
    monkeypatch.setattr(pallas_dtw, "VMEM_BUDGET", 110 * 1024)
    assert _pick_block(B, T, T, n_buffers=3) == 1
    jax.clear_caches()
    got1 = np.asarray(dtw_path_pallas(dist, n1, n2, interpret=True))
    np.testing.assert_array_equal(got1, want)
    jax.clear_caches()  # leave no tight-budget executables behind
