"""Batched on-device DTW alignment.

The reference aligns each same-word token pair with a per-pair Cython DTW
call on the host inside batch construction — its hottest loop (reference
dataloader.py:183-206 calling utils.py:147-153). Here the whole pair batch
is aligned on the TPU in one jitted computation:

1. :func:`pairwise_angular_distance` computes all B cost matrices with one
   batched matmul on the MXU (angular cosine distance, the same metric as
   reference utils.py:40-60).

2. :func:`dtw_costs` runs the DP with a **row scan**: the classic
   anti-diagonal wavefront has T1+T2-1 sequential steps of ragged vectors;
   instead we exploit that the within-row recurrence

       D[i,j] = c[i,j] + min(m[j], D[i,j-1]),   m[j] = min(D[i-1,j], D[i-1,j-1])

   is a (min,+) linear scan whose closed form is

       D[i,j] = S[j] + min(x0, min_{1<=k<=j}(m[k] - S[k-1])),
       S[j] = sum_{t=1..j} c[i,t]

   i.e. one cumsum + one cumulative-min per row — both fully parallel on
   the VPU — leaving only T1 sequential steps, each vectorized over the
   whole (B, T2) plane.

3. :func:`dtw_backtrace` walks the DP matrix back from each pair's true
   endpoint (lengths are passed separately; padding never needs masking
   because the DP flows strictly from (0,0) outward).

All shapes are static (pairs are padded to bucket sizes) so everything jits
once per bucket.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pairwise_angular_distance", "pairwise_kl_distance", "dtw_costs",
    "dtw_backtrace", "moves_from_costs", "walk_moves", "dtw_moves_auto",
    "dtw_align_from_dist", "onpath_from_moves", "dtw_path_from_dist",
    "dtw_path_stats",
    "dtw_align_batch", "align_diff_batch", "gather_aligned",
]

# plain float, not jnp.float32(...): a module-level jnp constant would
# eagerly initialise the default jax backend at import time, before
# callers (spawned gridsearch workers, the multi-chip dryrun) get the
# chance to pin the platform. jnp.full coerces it to f32 in-trace.
_BIG = 1e30


def pairwise_angular_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Batched angular cosine distance arccos(cos)/pi in [0, 1].

    x: (B, T1, d), y: (B, T2, d) -> (B, T1, T2). Zero-norm frames are
    distance 1 from everything except other zero-norm frames (distance 0),
    matching reference utils.py:40-60.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    nx = jnp.sqrt(jnp.sum(x * x, axis=-1))          # (B, T1)
    ny = jnp.sqrt(jnp.sum(y * y, axis=-1))          # (B, T2)
    zx = nx == 0.0
    zy = ny == 0.0
    dots = jnp.einsum("bid,bjd->bij", x, y,
                      preferred_element_type=jnp.float32)
    denom = (jnp.where(zx, 1.0, nx)[:, :, None]
             * jnp.where(zy, 1.0, ny)[:, None, :])
    sim = jnp.clip(dots / denom, -1.0, 1.0)
    d = jnp.arccos(sim) / jnp.pi
    d = jnp.where(zx[:, :, None] | zy[:, None, :], 1.0, d)
    d = jnp.where(zx[:, :, None] & zy[:, None, :], 0.0, d)
    return d


def anchor_angular_distance_rows(xa: jnp.ndarray, y: jnp.ndarray
                                 ) -> jnp.ndarray:
    """Row-major angular distance of ONE anchor against a token block:
    xa (T1, d), y (B, T2, d) -> (T1, B, T2).

    Same cells as ``pairwise_angular_distance(broadcast(xa), y)``
    transposed — but computed without materializing the (B, T1, d)
    anchor broadcast and without a separate (B, T1, T2) -> (T1, B, T2)
    transpose: one einsum whose leading output dim IS the DP row, the
    exact layout the row-streaming Pallas stats kernel consumes. This
    is the ABX tile rows' shape (eval/abx.py: every tile row scores one
    anchor against the tile's column tokens)."""
    xa = xa.astype(jnp.float32)
    y = y.astype(jnp.float32)
    nx = jnp.sqrt(jnp.sum(xa * xa, axis=-1))        # (T1,)
    ny = jnp.sqrt(jnp.sum(y * y, axis=-1))          # (B, T2)
    zx = nx == 0.0
    zy = ny == 0.0
    dots = jnp.einsum("id,bjd->ibj", xa, y,
                      preferred_element_type=jnp.float32)
    denom = (jnp.where(zx, 1.0, nx)[:, None, None]
             * jnp.where(zy, 1.0, ny)[None])
    sim = jnp.clip(dots / denom, -1.0, 1.0)
    d = jnp.arccos(sim) / jnp.pi
    d = jnp.where(zx[:, None, None] | zy[None], 1.0, d)
    d = jnp.where(zx[:, None, None] & zy[None], 0.0, d)
    return d


def anchor_kl_distance_rows(xa: jnp.ndarray, y: jnp.ndarray,
                            eps: float = 1e-10) -> jnp.ndarray:
    """Row-major symmetrised KL of ONE anchor posteriorgram against a
    token block: xa (T1, d), y (B, T2, d) -> (T1, B, T2). The anchor
    twin of :func:`pairwise_kl_distance` (same clipping/renorm), laid
    out for the row-streaming stats kernel like
    :func:`anchor_angular_distance_rows`."""
    p = jnp.clip(xa.astype(jnp.float32), eps, None)
    q = jnp.clip(y.astype(jnp.float32), eps, None)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    q = q / jnp.sum(q, axis=-1, keepdims=True)
    logp = jnp.log(p)
    logq = jnp.log(q)
    self_p = jnp.sum(p * logp, axis=-1)             # (T1,)
    self_q = jnp.sum(q * logq, axis=-1)             # (B, T2)
    cross_pq = jnp.einsum("ik,bjk->ibj", p, logq,
                          preferred_element_type=jnp.float32)
    cross_qp = jnp.einsum("ik,bjk->ibj", logp, q,
                          preferred_element_type=jnp.float32)
    kl_pq = self_p[:, None, None] - cross_pq
    kl_qp = self_q[None] - cross_qp
    return 0.5 * (kl_pq + kl_qp)


def pairwise_kl_distance(x: jnp.ndarray, y: jnp.ndarray,
                         eps: float = 1e-10) -> jnp.ndarray:
    """Batched symmetrised KL divergence between posteriorgram frames.

    x: (B, T1, d), y: (B, T2, d) -> (B, T1, T2) with
    d[i, j] = 0.5 * (KL(p_i || q_j) + KL(q_j || p_i)) — ABXpy's
    ``dtw_kl`` frame metric for posteriorgram features. Rows are clipped
    at ``eps`` and renormalized to distributions first, so zero padding
    rows become uniform (their distances are discarded by the DTW path
    mask anyway) and the logs are finite. Two MXU matmuls per direction:
    KL(p_i||q_j) = sum_k p_ik log p_ik - p_i . log q_j."""
    p = jnp.clip(x.astype(jnp.float32), eps, None)
    q = jnp.clip(y.astype(jnp.float32), eps, None)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    q = q / jnp.sum(q, axis=-1, keepdims=True)
    logp = jnp.log(p)
    logq = jnp.log(q)
    self_p = jnp.sum(p * logp, axis=-1)             # (B, T1)
    self_q = jnp.sum(q * logq, axis=-1)             # (B, T2)
    cross_pq = jnp.einsum("bik,bjk->bij", p, logq,
                          preferred_element_type=jnp.float32)
    cross_qp = jnp.einsum("bik,bjk->bij", logp, q,
                          preferred_element_type=jnp.float32)
    kl_pq = self_p[:, :, None] - cross_pq
    kl_qp = self_q[:, None, :] - cross_qp
    return 0.5 * (kl_pq + kl_qp)


def dtw_costs(dist: jnp.ndarray) -> jnp.ndarray:
    """Full DP cost tensor D for batched DTW.

    dist: (B, T1, T2) -> D: (B, T1, T2) with
    D[i,j] = dist[i,j] + min(D[i-1,j], D[i,j-1], D[i-1,j-1]).
    """
    B, T1, T2 = dist.shape
    row0 = jnp.cumsum(dist[:, 0, :], axis=1)

    def row_step(prev, c_row):
        # m[j] = min(D[i-1, j], D[i-1, j-1])
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _BIG), prev[:, :-1]], axis=1)
        m = jnp.minimum(prev, shifted)
        x0 = prev[:, :1] + c_row[:, :1]                       # D[i, 0]
        # S[j] = sum_{t=1..j} c[i,t], S[0] = 0
        S = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32),
             jnp.cumsum(c_row[:, 1:], axis=1)], axis=1)
        # b[k] = m[k] - S[k-1] for k >= 1; b[0] = m[0] + BIG is a sentinel
        # excluded from the running min, so x[0] = x0
        b = m - jnp.concatenate(
            [jnp.full((B, 1), -_BIG), S[:, :-1]], axis=1)
        cm = jax.lax.associative_scan(jnp.minimum, b, axis=1)
        x = S + jnp.minimum(cm, x0)
        return x, x

    _, rows = jax.lax.scan(row_step, row0,
                           jnp.moveaxis(dist[:, 1:, :], 1, 0))
    return jnp.concatenate([row0[:, None, :],
                            jnp.moveaxis(rows, 0, 1)], axis=1)


def dtw_backtrace(D: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backtrace optimal paths from each pair's true endpoint.

    D: (B, T1, T2); n1, n2: (B,) true lengths.
    Returns (path1, path2, path_len), paths (B, L) with L = T1+T2-1 in
    *increasing* order, padded past path_len by repeating the endpoint.
    Tie-breaking prefers the diagonal step (matches the host oracle
    utils.dtw_numpy).
    """
    move = moves_from_costs(D)
    return walk_moves(move, n1, n2)


def moves_from_costs(D: jnp.ndarray) -> jnp.ndarray:
    """Vectorized argmin move matrix from a DP cost tensor: 3=diag,
    2=up, 1=left (boundary cells compare against BIG)."""
    B, T1, T2 = D.shape
    pad_col = jnp.full((B, T1, 1), _BIG)
    pad_row = jnp.full((B, 1, T2), _BIG)
    diag = jnp.concatenate(
        [pad_row,
         jnp.concatenate([pad_col[:, :-1], D[:, :-1, :-1]], axis=2)],
        axis=1)
    up = jnp.concatenate([pad_row, D[:, :-1, :]], axis=1)
    left = jnp.concatenate([pad_col, D[:, :, :-1]], axis=2)
    take_diag = (diag <= up) & (diag <= left)
    take_up = (~take_diag) & (up <= left)
    di = jnp.where(take_diag | take_up, 1, 0).astype(jnp.int32)
    dj = jnp.where(take_diag | ~take_up, 1, 0).astype(jnp.int32)
    return (di * 2 + dj).astype(jnp.int8)


def walk_moves(move: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray):
    """Walk move matrices back from each pair's endpoint; output
    convention as in dtw_backtrace."""
    B, T1, T2 = move.shape
    L = T1 + T2 - 1

    def one(mv, i0, j0):
        def step(carry, _):
            i, j = carry
            m = mv[i, j]
            done = (i == 0) & (j == 0)
            ni = jnp.where(done, 0, i - (m >= 2))
            nj = jnp.where(done, 0, j - (m & 1))
            return (jnp.maximum(ni, 0), jnp.maximum(nj, 0)), (i, j)

        # unroll=4: unroll=16 shaves only ~0.02ms/step on TPU but doubles
        # CPU compile time across the test suite — not worth it
        (_, _), (ris, rjs) = jax.lax.scan(step, (i0, j0), None, length=L,
                                          unroll=4)
        # ris/rjs go from the endpoint back to (0,0) then repeat (0,0);
        # path length = number of steps until (0,0) inclusive
        at_origin = (ris == 0) & (rjs == 0)
        plen = L - jnp.sum(at_origin) + 1
        # flip to increasing order: fwd[s] = rev[plen-1-s]; pad repeats end
        s = jnp.arange(L)
        idx = jnp.clip(plen - 1 - s, 0, L - 1)
        return ris[idx], rjs[idx], plen

    return jax.vmap(one)(move, n1 - 1, n2 - 1)


def onpath_from_moves(move: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray
                      ) -> jnp.ndarray:
    """Alignment-path mask from a move matrix — no sequential walk.

    move: (B, T1, T2) argmin moves (3=diag, 2=up, 1=left) as produced by
    :func:`moves_from_costs`; n1, n2: (B,) true lengths. Returns A
    (B, T1, T2) float32 with A[i, j] = 1 exactly on the cells the
    backtrace chain from (n1-1, n2-1) to (0, 0) visits — the same cells
    :func:`walk_moves` emits, so ``A.sum((1, 2)) == path_len``.

    Why: the walk is a pointer chase with T1+T2-1 *sequential* gather
    steps (~0.9 ms at B=64, T=96 — 30x the DP kernel itself). Each cell
    has exactly one outgoing move, so the chain is the set of cells
    reachable from the endpoint following moves — computable by a
    *reverse* DP with the same row-parallel structure as the forward DP:

        R[i, j] = seed | (R[i+1, j] & mv[i+1, j]==up)
                       | (R[i+1, j+1] & mv[i+1, j+1]==diag)
                       | (R[i, j+1] & mv[i, j+1]==left)

    The within-row term is a right-to-left OR-scan gated by left-moves;
    with cnt[j] = #(non-left moves at t<=j) it has the closed form
    R[j] = (min_{k>=j, ext[k]} cnt[k]) == cnt[j] — one cumsum + one
    suffix-min per row, fully parallel on the VPU (mirror of the (min,+)
    trick in :func:`dtw_costs`). Train steps use A as loss weights over
    the embedding cosine matrix instead of gathering frames per path
    step (parallel/mesh.py), which is the TPU-first alignment contract:
    the path never materializes as indices on the hot path.
    """
    B, T1, T2 = move.shape
    mv = move.astype(jnp.int32)
    jj = jnp.arange(T2)[None, :]                       # (1, T2)
    seed_col = (jj == (n2 - 1)[:, None])               # (B, T2)
    not_left_cnt = jnp.cumsum(
        (mv != 1).astype(jnp.float32), axis=2)         # (B, T1, T2)

    def row_step(carry, inp):
        r_below, mv_below = carry
        mv_row, cnt_row, is_end_row = inp              # (B,T2),(B,T2),(B,1)
        from_up = r_below & (mv_below == 2)
        from_diag = jnp.concatenate(
            [(r_below & (mv_below == 3))[:, 1:],
             jnp.zeros((B, 1), bool)], axis=1)
        ext = (is_end_row & seed_col) | from_up | from_diag
        m = jnp.where(ext, cnt_row, _BIG)
        # suffix min via a reversed associative scan
        sufmin = jax.lax.associative_scan(jnp.minimum, m, axis=1,
                                          reverse=True)
        r = sufmin == cnt_row
        return (r, mv_row), r

    rows_rev = jnp.flip(jnp.moveaxis(mv, 1, 0), 0)             # (T1, B, T2)
    cnts_rev = jnp.flip(jnp.moveaxis(not_left_cnt, 1, 0), 0)
    is_end = jnp.flip((jnp.arange(T1)[:, None, None]
                       == (n1 - 1)[None, :, None]), 0)         # (T1, B, 1)
    init = (jnp.zeros((B, T2), bool), jnp.zeros((B, T2), jnp.int32))
    _, rs = jax.lax.scan(row_step, init, (rows_rev, cnts_rev, is_end))
    return jnp.moveaxis(jnp.flip(rs, 0), 0, 1).astype(jnp.float32)


_PALLAS_OK = None


def _pallas_available() -> bool:
    """True when the Pallas DTW kernel compiles on the default backend
    (resolved once; TPU only — the CPU path uses the XLA scan)."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        _PALLAS_OK = False
        if jax.default_backend() != "cpu":
            try:
                from abnet3_tpu.ops.pallas_dtw import (dtw_costs_pallas,
                                                       dtw_moves_pallas,
                                                       dtw_path_pallas)
                probe = jnp.zeros((1, 8, 128), jnp.float32)
                ones = jnp.ones((1,), jnp.int32)
                # probe ALL three kernels: the align dispatcher runs the
                # fused move kernel, dtw_costs_pallas the DP, and the
                # matrix-loss default runs the fused path kernel (whose
                # scratch_shapes/(block,1,1)-ref constructs can fail to
                # compile on Mosaic versions where the others succeed)
                jax.block_until_ready(dtw_moves_pallas(probe))
                jax.block_until_ready(dtw_costs_pallas(probe))
                jax.block_until_ready(dtw_path_pallas(probe, ones, ones))
                _PALLAS_OK = True
            except Exception as exc:
                print("Pallas DTW kernels unavailable "
                      "(falling back to the XLA scan): %r" % (exc,))
                _PALLAS_OK = False
    return _PALLAS_OK


def _pallas_enabled() -> bool:
    """Pallas DTW kernels default ON where they compile (TPU);
    ABNET3_PALLAS_DTW=0/false/no/off opts out. Read at trace time:
    set it before the process builds its train/align steps — flipping
    it later does not invalidate already-compiled jit caches."""
    flag = os.environ.get("ABNET3_PALLAS_DTW", "").lower()
    if flag in ("0", "false", "no", "off"):
        return False
    return _pallas_available()


_STATS_PALLAS_OK = None


def _stats_pallas_available() -> bool:
    """Separate probe for the forward-only stats kernel: it uses
    constructs the other kernels don't (pl.ANY input + run_scoped
    double-buffered async copies), so a Mosaic version where they
    compile but it doesn't must degrade ONLY the stats dispatch."""
    global _STATS_PALLAS_OK
    if _STATS_PALLAS_OK is None:
        _STATS_PALLAS_OK = False
        if _pallas_enabled():
            try:
                from abnet3_tpu.ops.pallas_dtw import dtw_path_stats_pallas
                probe = jnp.zeros((8, 8, 128), jnp.float32)
                ones = jnp.ones((8,), jnp.int32)
                jax.block_until_ready(
                    dtw_path_stats_pallas(probe, ones, ones))
                _STATS_PALLAS_OK = True
            except Exception as exc:
                print("Pallas stats kernel unavailable "
                      "(falling back to the XLA scan): %r" % (exc,))
                _STATS_PALLAS_OK = False
    return _STATS_PALLAS_OK


def path_stats_backend(shape, mesh=None) -> str:
    """Whether the row-streaming Pallas stats kernel is available and
    fits for a (B, T1, T2) stats problem: ``'pallas'`` or ``'scan'``.

    Consulted by the ABX tile dispatcher (eval/abx.py), which routes to
    the anchor-form rows kernel only at tile counts where the kernel's
    extra remote compile amortizes (measured N=4096, block=1024, T=96:
    rows route 1.42 s/tile warm vs 1.94 scan, but ~85 s more compile —
    the win is real from ~170 tiles up). The general
    :func:`dtw_path_stats_auto` stays on the XLA scan: outside the
    anchor-form tile layout the kernel measured only ~1.07x warm
    (batched transpose feed), which the compile cost erases. NOTE the
    first 'pallas' verdict per process probes the kernel with a real
    (tiny) compile."""
    B, T1, T2 = shape
    if mesh is not None and mesh.size > 1:
        n_data = dict(mesh.shape).get("data", 1)
        if B % max(n_data, 1):
            return "scan"
        B = B // max(n_data, 1)
    if not (_pallas_enabled() and _stats_pallas_available()):
        return "scan"
    from abnet3_tpu.ops.pallas_dtw import stats_fits_vmem
    return "pallas" if stats_fits_vmem(B, T1, T2) else "scan"


def _pallas_fits(dist_shape, n_buffers: int) -> bool:
    """Trace-time VMEM guard: False for length buckets whose per-pair
    planes overflow the kernel budget even at batch block 1 (e.g. a
    T=2048 bucket is ~50 MB of f32 planes per pair) — the dispatchers
    then take the XLA scan instead of compile-crashing Mosaic."""
    from abnet3_tpu.ops.pallas_dtw import fits_vmem
    B, T1, T2 = dist_shape
    return fits_vmem(B, T1, T2, n_buffers=n_buffers)


def dtw_moves_auto(dist: jnp.ndarray) -> jnp.ndarray:
    """Move matrix for backtrace: the fused Pallas kernel (DP + argmin in
    one kernel; the cost tensor never round-trips through HBM) where
    available — 1.38x the XLA scan through the full align path at B=64,
    T=96 (1.62 vs 2.24 ms/batch, round-4 fetch-terminated measurement;
    1.61x end-to-end in the chained train step, BASELINE.md) — else the
    XLA path."""
    if _pallas_enabled() and _pallas_fits(dist.shape, 2):
        from abnet3_tpu.ops.pallas_dtw import dtw_moves_pallas
        return dtw_moves_pallas(dist)
    return moves_from_costs(dtw_costs(dist))


def dtw_align_from_dist(dist: jnp.ndarray, n1: jnp.ndarray,
                        n2: jnp.ndarray, use_pallas: bool = True,
                        mesh=None):
    """Alignment paths from a precomputed distance tensor.

    use_pallas=False forces the XLA scan regardless of the env flag.
    ``mesh`` (a >1-device jax.sharding.Mesh with a 'data' axis) routes the
    fused kernel through shard_map so each device runs Pallas on its local
    batch shard — GSPMD cannot auto-partition a pallas_call, but the DP is
    embarrassingly parallel over pairs (pallas_dtw.py
    dtw_moves_pallas_sharded)."""
    if use_pallas and _pallas_enabled() and _pallas_fits(dist.shape, 2):
        if mesh is not None and mesh.size > 1:
            from abnet3_tpu.ops.pallas_dtw import dtw_moves_pallas_sharded
            move = dtw_moves_pallas_sharded(dist, mesh)
        else:
            from abnet3_tpu.ops.pallas_dtw import dtw_moves_pallas
            move = dtw_moves_pallas(dist)
    else:
        move = moves_from_costs(dtw_costs(dist))
    return walk_moves(move, n1, n2)


def dtw_path_from_dist(dist: jnp.ndarray, n1: jnp.ndarray,
                       n2: jnp.ndarray, use_pallas: bool = True,
                       mesh=None) -> jnp.ndarray:
    """Alignment-path mask A (B, T1, T2) float32 from a precomputed
    distance tensor — the matrix-loss twin of :func:`dtw_align_from_dist`:
    A[b, i, j] = 1 exactly on the backtrace-path cells, A.sum((1,2)) is
    the path length. Dispatches to the fused forward+reverse Pallas
    kernel on TPU (through shard_map over 'data' when ``mesh`` has >1
    devices), else the XLA scans; oversized length buckets (no VMEM-
    fitting block, see pallas_dtw.fits_vmem) also take the scans."""
    if use_pallas and _pallas_enabled() and _pallas_fits(dist.shape, 3):
        if mesh is not None and mesh.size > 1:
            from abnet3_tpu.ops.pallas_dtw import dtw_path_pallas_sharded
            return dtw_path_pallas_sharded(dist, n1, n2, mesh)
        from abnet3_tpu.ops.pallas_dtw import dtw_path_pallas
        return dtw_path_pallas(dist, n1, n2)
    return onpath_from_moves(moves_from_costs(dtw_costs(dist)), n1, n2)


def dtw_path_stats(dist: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(path_sum, path_len) of the backtrace path — no (B, T1, T2)
    materialization at all.

    Returns exactly what ``(sum(dist * A, (1, 2)), sum(A, (1, 2)))`` with
    ``A = dtw_path_from_dist(dist, n1, n2)`` returns (the ABX evaluator's
    normalized-DTW numerator/denominator), but as a single forward scan
    carrying two (B, T2) rows:

    - the path SUM is free: every move enters each visited cell exactly
      once, so the DP cost at the endpoint *is* the sum of ``dist`` along
      the backtrace chain;
    - the path LENGTH propagates through the same per-cell argmin rule
      the move matrix encodes (diag wins ties, then up —
      :func:`moves_from_costs`), so the chain is identical. Within a row
      a run of left-moves ends at the rightmost non-left ENTRY cell; an
      index max-scan finds it and one gather pulls the entry's length
      (the payload twin of the (min,+) closed form in
      :func:`dtw_costs`), keeping every row fully VPU-parallel.

    Why it exists: the ABX tile kernel only needs these two scalars per
    pair, and the mask route pays for the full cost tensor, the reverse
    DP, the (B, T1, T2) mask, and two masked reductions — measured 94%
    of tile wall at B=1024, T=96 (round-4 profile). ``path_len`` is
    bit-exact vs the mask route (integer chain length); ``path_sum``
    agrees to float-reduction rounding (~1e-6).
    """
    B, T1, T2 = dist.shape
    jj = jnp.arange(T2)[None, :]
    jj_f = jj.astype(jnp.float32)
    # endpoint selectors as masks: data-dependent take_along_axis
    # gathers inside the row scan lower to pathologically slow TPU
    # code (measured 16x vs the mask route); masked reductions and the
    # copy-scan below keep every op elementwise/reduction-shaped
    end_col = (jj == (n2 - 1)[:, None]).astype(jnp.float32)  # (B, T2)

    row0_c = dist[:, 0, :]
    D0 = jnp.cumsum(row0_c, axis=1)
    L0 = jnp.broadcast_to((jj_f + 1.0), (B, T2))

    def emit(D_row, L_row):
        return (jnp.sum(D_row * end_col, axis=1),
                jnp.sum(L_row * end_col, axis=1))

    def copy_scan(vals, valid):
        """Last-valid-value scan: out[j] = vals[k] for the largest
        k <= j with valid[k] (valid[0] always holds here)."""
        def comb(a, b):
            va, ca = a
            vb, cb = b
            return jnp.where(cb > 0, vb, va), jnp.maximum(ca, cb)
        out, _ = jax.lax.associative_scan(
            comb, (vals, valid.astype(jnp.float32)), axis=1)
        return out

    def row_step(carry, c_row):
        D_prev, L_prev = carry
        # cost row: the (min,+) closed form (see dtw_costs)
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _BIG), D_prev[:, :-1]], axis=1)
        m = jnp.minimum(D_prev, shifted)
        x0 = D_prev[:, :1] + c_row[:, :1]
        S1 = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32),
             jnp.cumsum(c_row[:, 1:], axis=1)], axis=1)
        b = m - jnp.concatenate(
            [jnp.full((B, 1), -_BIG), S1[:, :-1]], axis=1)
        cm = jax.lax.associative_scan(jnp.minimum, b, axis=1)
        D_cur = S1 + jnp.minimum(cm, x0)
        # per-cell move flags, exactly moves_from_costs' priorities
        diag = jnp.concatenate(
            [jnp.full((B, 1), _BIG), D_prev[:, :-1]], axis=1)
        up = D_prev
        left = jnp.concatenate(
            [jnp.full((B, 1), _BIG), D_cur[:, :-1]], axis=1)
        take_diag = (diag <= up) & (diag <= left)
        not_left = take_diag | ((~take_diag) & (up <= left))
        # entry length at non-left cells; a run of left-moves ending at
        # j extends its rightmost entry k <= j by (j - k) cells:
        # L[j] = j + (Le[k] - k), propagated by the copy-scan
        L_diag = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32), L_prev[:, :-1]], axis=1)
        Le = 1.0 + jnp.where(take_diag, L_diag, L_prev)
        L_cur = jj_f + copy_scan(Le - jj_f, not_left)
        return (D_cur, L_cur), emit(D_cur, L_cur)

    _, ends = jax.lax.scan(row_step, (D0, L0),
                           jnp.moveaxis(dist[:, 1:, :], 1, 0))
    d_ends = jnp.concatenate([emit(D0, L0)[0][None], ends[0]], axis=0)
    l_ends = jnp.concatenate([emit(D0, L0)[1][None], ends[1]], axis=0)
    end_row = (jnp.arange(T1)[:, None]
               == (n1 - 1)[None, :]).astype(jnp.float32)  # (T1, B)
    psum = jnp.sum(d_ends * end_row, axis=0)
    plen = jnp.sum(l_ends * end_row, axis=0)
    return psum, plen


def dtw_path_stats_auto(dist: jnp.ndarray, n1: jnp.ndarray,
                        n2: jnp.ndarray, mesh=None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`dtw_path_stats` (XLA scan), sharded over the mesh 'data'
    axis when a >1-device mesh is given (the DP is independent per
    pair; the batch must divide the axis, same contract as the Pallas
    dispatchers). Deliberately NOT dispatched to the Pallas stats
    kernel: fed a batched (B, T1, T2) tensor (transpose on the way in),
    the kernel measured only ~1.07x warm while costing ~2 min of extra
    remote compile — the kernel's real win is the anchor-form row-major
    tile layout, which the ABX tile dispatcher routes to explicitly
    (see :func:`path_stats_backend`)."""
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        spec = P("data")
        # check_vma off: the scan's initial length carry is built from
        # an unvarying iota, which the varying-manual-axes checker
        # rejects against the varying per-shard output carry (same
        # treatment as the Pallas sharded twins)
        f = jax.shard_map(dtw_path_stats, mesh=mesh,
                          in_specs=(spec, spec, spec),
                          out_specs=(spec, spec), check_vma=False)
        return f(dist, n1, n2)
    return dtw_path_stats(dist, n1, n2)


@jax.jit
def dtw_align_batch(f1: jnp.ndarray, f2: jnp.ndarray,
                    n1: jnp.ndarray, n2: jnp.ndarray):
    """End-to-end batched DTW alignment of padded token pairs.

    f1: (B, T1, d), f2: (B, T2, d) zero-padded; n1, n2: (B,) true lengths.
    Returns (path1, path2, path_len) as in :func:`dtw_backtrace`.
    """
    dist = pairwise_angular_distance(f1, f2)
    return dtw_align_from_dist(dist, n1, n2)


def align_diff_batch(n1: jnp.ndarray, n2: jnp.ndarray, T1: int, T2: int,
                     align_different_words: bool = False,
                     L: Optional[int] = None):
    """Alignment index paths for *different*-word pairs.

    - truncate mode (default): both words cut to min(n1, n2)
      (reference dataloader.py:227-228)
    - diagonal mode: the shorter word is stretched along the diagonal with
      rounded linspace indices (reference dataloader.py:217-225; the
      reference also swaps so X1 holds the longer word — the losses are
      symmetric in (X1, X2) so we keep the input order)

    Returns (path1, path2, path_len) with L = max(T1, T2) static by
    default; pass L to pad the paths to a longer static length (entries
    past path_len repeat clamped indices and are masked by callers).
    """
    if L is None:
        L = max(T1, T2)
    assert L >= max(T1, T2)
    s = jnp.arange(L, dtype=jnp.float32)[None, :]      # (1, L)
    n1f = n1.astype(jnp.float32)[:, None]
    n2f = n2.astype(jnp.float32)[:, None]
    if align_different_words:
        plen = jnp.maximum(n1, n2)
        denom = jnp.maximum(plen.astype(jnp.float32)[:, None] - 1.0, 1.0)
        p1 = jnp.rint(s * (n1f - 1.0) / denom).astype(jnp.int32)
        p2 = jnp.rint(s * (n2f - 1.0) / denom).astype(jnp.int32)
    else:
        plen = jnp.minimum(n1, n2)
        p1 = jnp.minimum(s, n1f - 1.0).astype(jnp.int32)
        p2 = jnp.minimum(s, n2f - 1.0).astype(jnp.int32)
    p1 = jnp.clip(p1, 0, T1 - 1)
    p2 = jnp.clip(p2, 0, T2 - 1)
    return p1, p2, plen


def gather_aligned(f: jnp.ndarray, path: jnp.ndarray) -> jnp.ndarray:
    """Gather aligned frames: f (B, T, d), path (B, L) -> (B, L, d)."""
    return jnp.take_along_axis(f, path[:, :, None], axis=1)
