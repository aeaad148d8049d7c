"""Pallas TPU kernel for the batched DTW dynamic program.

Computes the same DP as :func:`abnet3_tpu.ops.dtw.dtw_costs` but as one
Mosaic kernel: the pair block is staged in VMEM and the row recurrence
runs entirely on-chip, one cheap fori_loop iteration per row instead of an
XLA scan step (which costs ~20us of dispatch each).

Measured lessons baked in (TPU v5e, chained inputs so the tunnel's replay
cache can't skew results):
- the whole pair block must be ONE kernel body with a fori_loop over rows:
  multi-step Pallas grids cost milliseconds per grid step through this
  runtime (40ms for a 16-step grid vs 0.6ms as a single fori body);
- there is no cumsum lowering in Mosaic; prefix sum/min run as
  log-doubling shifts (~0.1us per (64,128) shift+op in VMEM);
- timings need >=30 warmup steps after compile (the first ~25 steps run
  slow) and MUST be fetch-terminated — jax.block_until_ready can return
  before the work completes on this tunnel (CLAUDE.md). Round-4 honest
  (fetch-terminated, fresh process, 24 distinct chained batches)
  numbers, B=64, T=96: full align path (distance matmul + DP + moves +
  backtrace gather) 1.62 ms/batch Pallas vs 2.24 ms XLA scan = 1.38x;
  end-to-end chained train step 1.61x (BASELINE.md round-4 A/B table) —
  so Pallas is the TPU default (dtw.py _pallas_enabled;
  ABNET3_PALLAS_DTW=0 opts out). Earlier "parity" readings were warmup
  noise; the earlier "1.9x (1.08 vs 2.04 ms)" figures were taken at the
  block and are superseded.

Per row the (min,+) recurrence uses the same closed form as the XLA path:

    D[i, j] = S[j] + min(x0, cummin_{k<=j}(m[k] - S[k-1]))

Falls back transparently to the XLA scan when Pallas is unavailable
(CPU tests run this kernel in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["dtw_costs_pallas", "dtw_moves_pallas",
           "dtw_moves_pallas_sharded", "dtw_path_pallas",
           "dtw_path_pallas_sharded", "dtw_path_stats_pallas",
           "dtw_path_stats_pallas_sharded", "dtw_path_stats_rows_pallas",
           "dtw_path_stats_rows_pallas_sharded", "fits_vmem",
           "stats_fits_vmem"]

_BIG = 1e30  # plain float: jnp constants cannot be captured by a kernel
BLOCK_B = 8  # preferred block; the call picks the largest VMEM-fitting one
# VMEM the kernel's per-pair buffers may claim, measured in TILED bytes
# (see _pick_block): ~11 of a v5e core's 16 MiB scoped limit, leaving
# headroom for Mosaic's own staging. The value keeps every block choice
# validated on hardware (T=96 -> 64, T=512/3buf -> 2) and keeps
# rejecting the never-validated T>=1024 3-buffer shape. Tests
# monkeypatch this to force shrunk blocks through the interpret-mode
# parity check.
VMEM_BUDGET = 11_534_336  # exactly 11.0 MiB


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block(B: int, T1: int, T2: int,
                vmem_budget: int = None,
                n_buffers: int = 2, n_len_refs: int = 0):
    """TPU grid iterations run sequentially, so bigger batch blocks mean
    fewer sequential kernel bodies; cap by VMEM (n_buffers 4-byte
    (T1, T2) planes per pair: in + out, plus any scratch). Shrinks below
    BLOCK_B for long-token buckets where 8 pairs of planes overflow
    VMEM; returns None when even a single pair does not fit — callers
    (ops.dtw dispatchers) then fall back to the XLA scan instead of
    handing Mosaic an uncompilable block (a T=2048 bucket is ~50 MB of
    planes per pair: no block fits).

    VMEM is counted in TILED bytes: Mosaic stores a ref's last two dims
    in (8, 128) tiles, so a (block, T1, T2) f32 buffer occupies
    block * ceil8(T1) * ceil128(T2) * 4 bytes regardless of the logical
    shape. Round-4 hardware lesson: a (1024, 16, 16) f32 ref allocates
    8.4 MB, not 1 MB — the logical-size accounting passed block=1024
    and the kernel stack (3 buffers, 24.8 MB) blew the 16 MB scoped
    limit at compile time. ``n_len_refs`` counts (block, 1, 1) length
    refs (the fused path kernel carries two), 4 KB per pair each once
    tiled."""
    if vmem_budget is None:
        vmem_budget = VMEM_BUDGET
    per_pair = _round_up(T1, 8) * _round_up(T2, 128) * 4 * n_buffers
    per_pair += n_len_refs * 8 * 128 * 4
    if per_pair > vmem_budget:
        return None
    block = 1
    while block * 2 <= max(B, BLOCK_B) and (block * 2) * per_pair \
            <= vmem_budget:
        block *= 2
    return block


def fits_vmem(B: int, T1: int, T2: int, n_buffers: int = 3,
              n_len_refs: int = None) -> bool:
    """True when some batch block of a (B, T1, T2) problem fits the
    kernel VMEM budget (n_buffers=3 covers the fused path kernel, the
    largest consumer: dist in + mask out + move scratch + its two
    length refs). ``n_len_refs`` defaults to the probed kernels' actual
    counts (path kernel: 2; move/DP kernels: 0) — pass it explicitly
    for kernels with other layouts so the guard and the kernel's own
    _pick_block stay in lockstep."""
    if n_len_refs is None:
        n_len_refs = 2 if n_buffers >= 3 else 0
    return _pick_block(B, T1, T2, n_buffers=n_buffers,
                       n_len_refs=n_len_refs) is not None


def _shift_right(x, k, fill):
    B = x.shape[0]
    return jnp.concatenate(
        [jnp.full((B, k), jnp.float32(fill)), x[:, :-k]], axis=1)


def _prefix_sum(x):
    """Inclusive row prefix sum by log-doubling shifts (Mosaic has no
    cumsum lowering)."""
    T = x.shape[1]
    shift = 1
    while shift < T:
        x = x + _shift_right(x, shift, 0.0)
        shift *= 2
    return x


def _prefix_min(x):
    T = x.shape[1]
    shift = 1
    while shift < T:
        x = jnp.minimum(x, _shift_right(x, shift, _BIG))
        shift *= 2
    return x

def _dp_row(c, prev):
    """One forward DP row via the (min,+) closed form:
    x[j] = S[j] + min(x0, cummin_{k<=j}(m[k] - S[k-1])). Returns
    (x, diag) — diag is reused by the move computation."""
    diag = _shift_right(prev, 1, _BIG)
    m = jnp.minimum(prev, diag)
    x0 = prev[:, :1] + c[:, :1]
    # S[j] = sum_{t=1..j} c[t] = inclusive prefix sum - c[0]
    S = _prefix_sum(c) - c[:, :1]
    b = m - _shift_right(S, 1, -_BIG)
    x = S + jnp.minimum(_prefix_min(b), x0)
    return x, diag


def _dp_move_row(c, prev):
    """Forward DP row + its argmin moves (3=diag, 2=up, 1=left; ties
    prefer diag then up, matching ops.dtw.moves_from_costs)."""
    x, diag = _dp_row(c, prev)
    left = _shift_right(x, 1, _BIG)
    take_diag = (diag <= prev) & (diag <= left)
    take_up = (~take_diag) & (prev <= left)
    di = jnp.where(take_diag | take_up, 1, 0)
    dj = jnp.where(take_diag | ~take_up, 1, 0)
    return x, di * 2 + dj



def _dtw_kernel(dist_ref, out_ref):
    """dist_ref/out_ref: (BLOCK_B, T1, T2) VMEM blocks; the row loop is a
    fori_loop inside ONE kernel body (multi-step Pallas grids cost ~ms per
    step through this runtime, see module docstring)."""
    T1 = dist_ref.shape[1]

    row0 = _prefix_sum(dist_ref[:, 0, :])
    out_ref[:, 0, :] = row0

    def row_step(i, prev):
        x, _ = _dp_row(dist_ref[:, i, :], prev)
        out_ref[:, i, :] = x
        return x

    jax.lax.fori_loop(1, T1, row_step, row0)


def _dtw_move_kernel(dist_ref, move_ref):
    """Fused DP + backtrace-move matrix: runs the row recurrence and emits
    the per-cell argmin move (3=diag, 2=up, 1=left) directly — the D
    tensor never leaves the kernel, replacing the separate vectorized
    move pass over a materialized D. int32 output (Mosaic cannot store
    int8 rows into 3-D refs)."""
    T1 = dist_ref.shape[1]
    B = dist_ref.shape[0]
    T2 = dist_ref.shape[2]

    prev0 = _prefix_sum(dist_ref[:, 0, :])
    col = jax.lax.broadcasted_iota(jnp.int32, (B, T2), 1)
    move_ref[:, 0, :] = jnp.where(col == 0, 3, 1)

    def row_step(i, prev):
        x, mv = _dp_move_row(dist_ref[:, i, :], prev)
        move_ref[:, i, :] = mv
        return x

    jax.lax.fori_loop(1, T1, row_step, prev0)


def _shift_left(x, k, fill):
    B = x.shape[0]
    return jnp.concatenate(
        [x[:, k:], jnp.full((B, k), jnp.float32(fill))], axis=1)


def _suffix_min(x):
    T = x.shape[1]
    shift = 1
    while shift < T:
        x = jnp.minimum(x, _shift_left(x, shift, _BIG))
        shift *= 2
    return x


def _dtw_path_kernel(dist_ref, n1_ref, n2_ref, out_ref, mv_ref):
    """Fused DP + on-path mask: phase 1 runs the forward row recurrence
    and stores argmin moves in VMEM scratch; phase 2 runs the *reverse*
    row recurrence of ops.dtw.onpath_from_moves (suffix-min closed form
    of the left-move OR-scan) and emits the alignment mask A — the moves
    never leave the kernel and no sequential backtrace walk happens
    anywhere (the walk costs ~0.9 ms at B=64, T=96; both DP phases
    together are ~0.06 ms)."""
    B = dist_ref.shape[0]
    T1 = dist_ref.shape[1]
    T2 = dist_ref.shape[2]

    # ---- phase 1: forward DP -> moves (same math as _dtw_move_kernel)
    prev0 = _prefix_sum(dist_ref[:, 0, :])
    col = jax.lax.broadcasted_iota(jnp.int32, (B, T2), 1)
    mv_ref[:, 0, :] = jnp.where(col == 0, 3, 1)

    def fwd_step(i, prev):
        x, mv = _dp_move_row(dist_ref[:, i, :], prev)
        mv_ref[:, i, :] = mv
        return x

    jax.lax.fori_loop(1, T1, fwd_step, prev0)

    # ---- phase 2: reverse DP -> on-path mask
    # n refs are (B, 1, 1): their constrained last-two dims are (1, 1)
    # == the full array dims, so ANY batch block is Mosaic-legal (a 2-D
    # (block, 1) ref needs block % 8 == 0, which shrunk VMEM blocks for
    # long buckets violate)
    n1m1 = n1_ref[:, 0, :] - 1                        # (B, 1)
    seed_col = (col == (n2_ref[:, 0, :] - 1)).astype(jnp.float32)

    def rev_step(t, carry):
        r_below, mv_below = carry
        i = T1 - 1 - t
        mv_row = mv_ref[:, i, :]
        cnt = _prefix_sum((mv_row != 1).astype(jnp.float32))
        from_up = r_below * (mv_below == 2)
        from_diag = jnp.concatenate(
            [(r_below * (mv_below == 3))[:, 1:],
             jnp.zeros((B, 1), jnp.float32)], axis=1)
        is_end = (n1m1 == i).astype(jnp.float32)
        ext = jnp.maximum(jnp.maximum(is_end * seed_col, from_up),
                          from_diag)
        m = jnp.where(ext > 0, cnt, _BIG)
        r = (_suffix_min(m) == cnt).astype(jnp.float32)
        out_ref[:, i, :] = r
        return r, mv_row

    init = (jnp.zeros((B, T2), jnp.float32),
            jnp.zeros((B, T2), jnp.int32))
    jax.lax.fori_loop(0, T1, rev_step, init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dtw_path_pallas(dist: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Batched DTW alignment-path mask A (B, T1, T2) float32 via the
    fused forward+reverse Pallas kernel; A[b].sum() == path length.
    Same cells as ops.dtw.onpath_from_moves (tested equal)."""
    B, T1, T2 = dist.shape
    # in + out + move scratch, plus the two (block, 1, 1) length refs
    block = _pick_block(B, T1, T2, n_buffers=3, n_len_refs=2)
    if block is None:
        raise ValueError(
            f"DTW shape (T1={T1}, T2={T2}) exceeds the Pallas VMEM "
            "budget even at block=1; use ops.dtw.dtw_path_from_dist, "
            "which falls back to the XLA scan for such buckets")
    pad = (-B) % block
    if pad:
        dist = jnp.concatenate(
            [dist, jnp.zeros((pad, T1, T2), dist.dtype)], axis=0)
        n1 = jnp.concatenate([n1, jnp.ones((pad,), n1.dtype)])
        n2 = jnp.concatenate([n2, jnp.ones((pad,), n2.dtype)])
    Bp = B + pad
    out = pl.pallas_call(
        _dtw_path_kernel,
        grid=(Bp // block,),
        in_specs=[
            pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T1, T2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, T1, T2), jnp.int32)],
        interpret=interpret,
    )(dist.astype(jnp.float32),
      n1.astype(jnp.int32)[:, None, None],
      n2.astype(jnp.int32)[:, None, None])
    return out[:B]


def dtw_path_pallas_sharded(dist: jnp.ndarray, n1: jnp.ndarray,
                            n2: jnp.ndarray, mesh,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused path-mask kernel on a multi-device mesh via ``jax.shard_map``
    over 'data' (same rationale as dtw_moves_pallas_sharded: GSPMD cannot
    partition a pallas_call, the DP is independent per pair)."""
    from jax.sharding import PartitionSpec as P

    f = jax.shard_map(
        lambda d, a, b: dtw_path_pallas(d, a, b, interpret=interpret),
        mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False)
    return f(dist, n1, n2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dtw_moves_pallas(dist: jnp.ndarray, interpret: bool = False
                     ) -> jnp.ndarray:
    """Batched DTW move matrix (int8) via the fused Pallas kernel."""
    B, T1, T2 = dist.shape
    block = _pick_block(B, T1, T2)
    if block is None:
        raise ValueError(
            f"DTW shape (T1={T1}, T2={T2}) exceeds the Pallas VMEM "
            "budget even at block=1; use ops.dtw.dtw_align_from_dist, "
            "which falls back to the XLA scan for such buckets")
    pad = (-B) % block
    if pad:
        dist = jnp.concatenate(
            [dist, jnp.zeros((pad, T1, T2), dist.dtype)], axis=0)
    Bp = B + pad
    out = pl.pallas_call(
        _dtw_move_kernel,
        grid=(Bp // block,),
        in_specs=[pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T1, T2), jnp.int32),
        interpret=interpret,
    )(dist.astype(jnp.float32))
    return out[:B].astype(jnp.int8)


def dtw_moves_pallas_sharded(dist: jnp.ndarray, mesh,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused move kernel on a multi-device mesh via ``jax.shard_map``.

    GSPMD cannot auto-partition a ``pallas_call``, but the DTW DP is
    embarrassingly parallel over pairs: shard the batch over the mesh's
    'data' axis and run the kernel per device on its local shard — the
    TPU-native way to keep the measured 1.9x Pallas win on multi-chip
    meshes instead of falling back to the XLA scan. The batch must divide
    the 'data' axis (the pjit factories already pad group sizes to it,
    parallel/mesh.py _pad_groups). Arrays stay replicated over any other
    mesh axes ('model'): every member runs the identical kernel, so the
    replication invariant holds by construction (check_vma off — Pallas
    calls carry no varying-manual-axes info for the checker).
    """
    from jax.sharding import PartitionSpec as P

    spec = P("data")
    f = jax.shard_map(
        lambda d: dtw_moves_pallas(d, interpret=interpret),
        mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    return f(dist)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dtw_costs_pallas(dist: jnp.ndarray, interpret: bool = False
                     ) -> jnp.ndarray:
    """Batched DTW DP cost tensor via a Pallas kernel.

    dist: (B, T1, T2) float32; B is padded internally to the batch block.
    """
    B, T1, T2 = dist.shape
    block = _pick_block(B, T1, T2)
    if block is None:
        raise ValueError(
            f"DTW shape (T1={T1}, T2={T2}) exceeds the Pallas VMEM "
            "budget even at block=1; use ops.dtw.dtw_costs (XLA scan) "
            "for such buckets")
    pad = (-B) % block
    if pad:
        dist = jnp.concatenate(
            [dist, jnp.zeros((pad, T1, T2), dist.dtype)], axis=0)
    Bp = B + pad
    out = pl.pallas_call(
        _dtw_kernel,
        grid=(Bp // block,),
        in_specs=[pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T1, T2), jnp.float32),
        interpret=interpret,
    )(dist.astype(jnp.float32))
    return out[:B]


# ---------------------------------------------------------------------------
# Forward-only path-stats kernel (the ABX distance tiles' inner loop)
# ---------------------------------------------------------------------------

# VMEM the stats kernel may claim, in TILED bytes. The kernel streams
# (B, T2) distance ROWS (2 double-buffered slots, ~B*T2r*4 each), keeps
# two (B, T2) DP carries plus ~a dozen row temporaries live, and holds
# four (B, 1) n/out refs (ceil8(B)*128*4 each once tiled) — everything
# scales with B, nothing with T1, so the budget translates into a max
# batch width (B=1024 at T2<=128 fits with ~5 MB of headroom; the ABX
# tile rows are exactly (1024, T, T)).
STATS_VMEM_BUDGET = 11_534_336  # 11.0 MiB, like VMEM_BUDGET
# live (B, T2r) rows budgeted: 2 slab slots + D/L carries + Le/flag/
# scan temporaries the compiler keeps around (measured headroom, not a
# hard count — Mosaic reuses registers for most of the shift chain)
_STATS_LIVE_ROWS = 14


def _stats_vmem_bytes(B: int, T2: int) -> int:
    Bp = _round_up(max(B, 8), 8)
    rows = _STATS_LIVE_ROWS * Bp * _round_up(T2, 128) * 4
    refs = 4 * Bp * 128 * 4  # n1, n2, psum, plen
    return rows + refs


def stats_fits_vmem(B: int, T1: int, T2: int,
                    vmem_budget: int = None) -> bool:
    """True when the stats kernel's row-slab/carry/ref budget fits a
    (B, T1, T2) problem (ops.dtw.dtw_path_stats_auto's dispatch guard —
    in lockstep with the kernel wrapper). Everything on-chip is
    (B, T2)-shaped, so T1 never disqualifies; too-wide batches do
    (the XLA scan takes those)."""
    if vmem_budget is None:
        vmem_budget = STATS_VMEM_BUDGET
    return _stats_vmem_bytes(B, T2) <= vmem_budget


def _last_valid_scan(v, c):
    """Row-wise last-valid-value propagation by log-doubling:
    out[j] = v[k] for the largest k <= j with c[k] > 0 (c[0] > 0 must
    hold, as in ops.dtw.dtw_path_stats' copy_scan — the first cell of a
    row is never a left-entry). Same associative combine as the XLA
    version's associative_scan; min/max/select are order-exact, so the
    result is bitwise equal."""
    T = v.shape[1]
    shift = 1
    while shift < T:
        vs = _shift_right(v, shift, 0.0)
        cs = _shift_right(c, shift, 0.0)
        v = jnp.where(c > 0, v, vs)
        c = jnp.maximum(c, cs)
        shift *= 2
    return v


def _last_valid_encode_limit(T1: int, T2: int):
    """Multiplier M for the encoded last-valid prefix-max, or None when
    (T2-1)*M + payload would leave float32's exact-integer range
    (2^24). The payload v = Le[k] - k + T2 lies in [1, T1 + 2*T2]."""
    limit = T1 + 2 * T2 + 2
    M = 1
    while M < limit:
        M *= 2
    if (T2 - 1) * M + limit >= (1 << 24):
        return None
    return M


def _last_valid_scan_encoded(v, c, col, M):
    """:func:`_last_valid_scan` as ONE prefix-max over position-encoded
    floats: e[k] = k*M + (v[k] + offset) for valid k (else -1); the
    running max's dominant term is the largest valid position and the
    payload rides exactly (all integers < 2^24 in f32). 19 vector
    passes vs the select-chain's 28 — and max is order-exact, so the
    result is still bitwise the XLA copy_scan's. ``col`` is the iota
    the caller already has; offset T2-sized keeps payloads positive."""
    T2 = v.shape[1]
    e = jnp.where(c > 0, col * jnp.float32(M) + (v + jnp.float32(T2)),
                  jnp.float32(-1.0))
    shift = 1
    while shift < T2:
        e = jnp.maximum(e, _shift_right(e, shift, -1.0))
        shift *= 2
    k = jnp.floor(e / jnp.float32(M))
    return e - k * jnp.float32(M) - jnp.float32(T2)


def _make_stats_kernel(B: int, T1: int, T2: int):
    """Build the single-body stats kernel for a row-major (T1, B, T2)
    problem.

    Layout: ``dist`` is transposed row-major OUTSIDE the kernel and
    stays in HBM (pl.ANY); the kernel streams one (B, T2) distance row
    per DP step through a 2-slot double-buffered VMEM slab, so every
    row op runs at the FULL batch width. (An earlier batch-chunked
    (P, T1, T2)-slab layout capped P at 64 by VMEM and serialized the
    work into 16x narrower ops — measured 3.76 s/tile vs the scan's
    1.94 on hardware; this layout replaces it.) Each distance value is
    read from HBM exactly once; the DP carries (D, L rows) and the
    (B, 1) stat accumulators never leave VMEM — vs the scan's ~10
    (B, T2) row tensors round-tripping HBM per sequential step."""

    M_enc = _last_valid_encode_limit(T1, T2)

    def kernel(t1_ref, dist_hbm, n1_ref, n2_ref, psum_ref, plen_ref):
        def body(slab, sems):
            # slab rows [slot*B, slot*B + B) are the slot's buffer (a
            # flat (2*B, T2) ref: dynamic pl.ds on the sublane dim only)
            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    dist_hbm.at[i],
                    slab.at[pl.ds(slot * B, B)],
                    sems.at[slot])

            get_dma(0, 0).start()
            if T1 > 1:
                get_dma(1, 1).start()

            # Mosaic's tpu.iota is integer-only: build int32 and convert
            col = jax.lax.broadcasted_iota(jnp.int32, (B, T2), 1) \
                .astype(jnp.float32)
            n1c = n1_ref[:, :]
            n2c = n2_ref[:, :]
            end_col = (col == (n2c - 1.0)).astype(jnp.float32)

            # dynamic trip count (the static T1 rides in SMEM): a
            # statically-bounded fori_loop gets UNROLLED by the Mosaic
            # lowering — ~80 vector ops x T1 rows to schedule, measured
            # 450-675 s remote compiles at T1=96 vs 54 s at T1=8,
            # compile time scaling with T1 and not B. The dynamic bound
            # forces a real loop; warm runtime is unchanged.
            # (A per-row @pl.when emit gate was measured and REVERTED:
            # conditional output-ref accumulation inside the loop took
            # the kernel compile from 136 s to 391 s for a warm win of
            # only ~0.12 s/tile — a net loss from any realistic tile
            # count. Emits stay unconditional carry math.)
            t1d = t1_ref[0]

            get_dma(0, 0).wait()
            D = _prefix_sum(slab[pl.ds(0, B), :])
            L = col + 1.0
            is_end = (n1c == 1.0).astype(jnp.float32)
            accp = is_end * jnp.sum(D * end_col, axis=1, keepdims=True)
            accl = is_end * jnp.sum(L * end_col, axis=1, keepdims=True)

            def row_step(i, carry):
                D_prev, L_prev, ap, al = carry
                slot = i % 2

                @pl.when(i + 1 < t1d)
                def _prefetch():
                    # slot (i+1) % 2 was consumed at step i-1; at most
                    # two copies are ever in flight
                    get_dma((i + 1) % 2, i + 1).start()

                get_dma(slot, i).wait()
                c = slab[pl.ds(slot * B, B), :]
                x, diag = _dp_row(c, D_prev)
                left = _shift_right(x, 1, _BIG)
                take_diag = (diag <= D_prev) & (diag <= left)
                not_left = take_diag | ((~take_diag) & (D_prev <= left))
                # entry length at non-left cells; a run of left-moves
                # extends its rightmost entry k by (j - k) cells
                L_diag = _shift_right(L_prev, 1, 0.0)
                Le = 1.0 + jnp.where(take_diag, L_diag, L_prev)
                nl = not_left.astype(jnp.float32)
                if M_enc is not None:
                    L_cur = col + _last_valid_scan_encoded(
                        Le - col, nl, col, M_enc)
                else:
                    L_cur = col + _last_valid_scan(Le - col, nl)
                i_f = jax.lax.convert_element_type(i, jnp.float32)
                is_end = (n1c == i_f + 1.0).astype(jnp.float32)
                ap = ap + is_end * jnp.sum(x * end_col, axis=1,
                                           keepdims=True)
                al = al + is_end * jnp.sum(L_cur * end_col, axis=1,
                                           keepdims=True)
                return (x, L_cur, ap, al)

            _, _, accp, accl = jax.lax.fori_loop(
                1, t1d, row_step, (D, L, accp, accl))
            psum_ref[:, :] = accp
            plen_ref[:, :] = accl

        pl.run_scoped(body,
                      slab=pltpu.VMEM((2 * B, T2), jnp.float32),
                      sems=pltpu.SemaphoreType.DMA((2,)))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def dtw_path_stats_rows_pallas(dist_rows: jnp.ndarray, n1: jnp.ndarray,
                               n2: jnp.ndarray, interpret: bool = False):
    """Row-major core of :func:`dtw_path_stats_pallas`: ``dist_rows``
    is (T1, B, T2) — each DP step's (B, T2) row is one contiguous DMA.
    Produce this layout directly where the caller can (the ABX tile
    rows via ops.dtw.anchor_angular_distance_rows: one einsum, no
    anchor broadcast, no transpose); the batched wrapper below
    transposes for callers holding (B, T1, T2)."""
    T1, B, T2 = dist_rows.shape
    if not stats_fits_vmem(B, T1, T2):
        raise ValueError(
            f"stats-kernel working set for (B={B}, T2={T2}) exceeds "
            "the VMEM budget; use ops.dtw.dtw_path_stats (XLA scan) "
            "for such batches")
    pad = (-B) % 8
    if pad:
        dist_rows = jnp.concatenate(
            [dist_rows, jnp.zeros((T1, pad, T2), dist_rows.dtype)],
            axis=1)
        n1 = jnp.concatenate([n1, jnp.ones((pad,), n1.dtype)])
        n2 = jnp.concatenate([n2, jnp.ones((pad,), n2.dtype)])
    Bp = B + pad
    # Mosaic requires the slab DMA slices' last dim 128-aligned (hit on
    # hardware at T2=96: "Slice shape along dimension 2 must be aligned
    # to tiling (128)"). Zero-pad columns — inert: the (min,+)
    # recurrence only flows left->right and end_col (built from the
    # true n2) never selects a pad column.
    T2r = _round_up(T2, 128)
    if T2r != T2:
        dist_rows = jnp.concatenate(
            [dist_rows,
             jnp.zeros((T1, Bp, T2r - T2), dist_rows.dtype)], axis=2)
    psum, plen = pl.pallas_call(
        _make_stats_kernel(Bp, T1, T2r),
        in_specs=[
            # T1 as an SMEM scalar: dynamic loop bound (see kernel)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # dist stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, 1), jnp.float32)],
        interpret=interpret,
    )(jnp.full((1,), T1, jnp.int32),
      dist_rows.astype(jnp.float32),
      n1.astype(jnp.float32)[:, None],
      n2.astype(jnp.float32)[:, None])
    return psum[:B, 0], plen[:B, 0]


def dtw_path_stats_rows_pallas_sharded(dist_rows: jnp.ndarray,
                                       n1: jnp.ndarray, n2: jnp.ndarray,
                                       mesh, interpret: bool = False):
    """Rows-layout stats kernel over a multi-device mesh: the batch is
    dist_rows' MIDDLE axis, sharded over 'data' (same per-pair
    independence contract as the other sharded twins)."""
    from jax.sharding import PartitionSpec as P

    f = jax.shard_map(
        lambda d, a, b: dtw_path_stats_rows_pallas(d, a, b,
                                                   interpret=interpret),
        mesh=mesh, in_specs=(P(None, "data", None), P("data"),
                             P("data")),
        out_specs=(P("data"), P("data")), check_vma=False)
    return f(dist_rows, n1, n2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dtw_path_stats_pallas(dist: jnp.ndarray, n1: jnp.ndarray,
                          n2: jnp.ndarray, interpret: bool = False):
    """(path_sum, path_len) of the DTW backtrace path — the Pallas twin
    of :func:`abnet3_tpu.ops.dtw.dtw_path_stats` (same per-cell argmin
    chain; ``path_len`` is bitwise equal, ``path_sum`` agrees to float
    summation-order rounding ~1e-6 — the log-doubling prefix sums add
    in a different order than the XLA scan's cumsum).

    Why it exists: the ABX tile rows are stats-DP-bound, and the XLA
    scan's row step round-trips ~10 (B, T2) tensors through HBM per
    sequential step where this kernel streams each ``dist`` row through
    a double-buffered VMEM slab and keeps the DP carries on-chip.

    dist: (B, T1, T2) float32; n1, n2: (B,) true lengths. B pads to the
    sublane multiple, T2 to the lane multiple. Raises when the (B, T2)-
    shaped working set exceeds VMEM — dispatchers guard with
    :func:`stats_fits_vmem` and take the XLA scan for such batches."""
    # row-major so each DP step's (B, T2) row is one contiguous DMA
    return dtw_path_stats_rows_pallas(
        jnp.moveaxis(dist.astype(jnp.float32), 1, 0), n1, n2,
        interpret=interpret)


def dtw_path_stats_pallas_sharded(dist: jnp.ndarray, n1: jnp.ndarray,
                                  n2: jnp.ndarray, mesh,
                                  interpret: bool = False):
    """Stats kernel on a multi-device mesh via ``jax.shard_map`` over
    'data' (GSPMD cannot partition a pallas_call; the DP is independent
    per pair — same contract as dtw_moves_pallas_sharded)."""
    from jax.sharding import PartitionSpec as P

    spec = P("data")
    f = jax.shard_map(
        lambda d, a, b: dtw_path_stats_pallas(d, a, b,
                                              interpret=interpret),
        mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, spec), check_vma=False)
    return f(dist, n1, n2)
