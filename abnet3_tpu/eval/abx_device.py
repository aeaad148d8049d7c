"""TPU-native ABX triplet scoring over a device-resident distance matrix.

The distance stage has been on-device since round 2 (eval/abx.py
distance_matrix), but triplet aggregation stayed a host numpy loop over
occupied cells — and at ZeroSpeech scale that loop became the dominant
stage: the round-4 N=30,000 hardware run spent 892 s scoring serially
(one core) after the forward-only stats DP cut the 450M-pair distance
stage to 787 s (COVERAGE.md "Round-4 ZeroSpeech-scale ABX runs"). The
reference never scored at all — it defers to external CPU ABXpy
(reference README.md:3, embedder.py:98-100) — so this stage IS the
framework's replacement for ABXpy's collapse machinery, and it should
ride the same chip the distances came from.

Design
------
Scoring is gather + compare + bin — a TPU-friendly shape once cells are
regrouped by what they share:

- Within one (class_A=ca, speaker=s, by-group=g) anchor POOL, every
  anchor shares the same B set (across: ca tokens of OTHER speakers in
  g; within: the other ca tokens of s in g) and draws X from the same
  candidate pool (the tokens of (s, g)). So anchors process in
  per-pool slots: one row gather of D per anchor gives d(a, B)
  (A, max_b) and d(a, X) (A, max_x), and a masked comparison cube
  reduced over B yields per-(anchor, x) greater/equal counts — integer
  VPU work.
- Cell attribution avoids a flat scatter into |C|^2 bins (TPU scatters
  serialize): each pool's X candidate table is pre-sorted by class, so
  one segment-sum over the X axis collapses (A, max_x) counts to
  per-class columns, and one scatter-add of anchor rows lands them in
  the cell bins.
- ABXpy BY-conditioning (cells become (by, ca, cx)) rides the SAME
  kernel: bin rows are dense COMPOSITE (by-group, class) ids — each
  group's classes occupy a contiguous row range, so one pass over all
  pools accumulates every group's cells at once and the host slices
  per-group blocks out of one fetched bin matrix. No matrix re-slicing,
  no per-group host fallback: by-conditioned runs stay fetch-free off a
  :class:`DeviceMatrix`.
- The WITHIN task rides the same composite-row trick one level up
  (round-5): its cells are (ca, cx, SPEAKER), so bin rows are the dense
  OCCUPIED (speaker, composite-class) anchor rows — known analytically
  from the cell-count histogram — and the whole task is ONE pass over
  all pools with ONE bin fetch, exactly like across. (Round 4 looped
  speakers serially, one run + fetch per speaker: fine at S=20, it
  re-serialized the stage at LibriSpeech-style S≈100+ — round-4
  VERDICT weak #3.) Occupied rows also make the fetch compact by
  construction; only the column axis still compacts explicitly.
- Small pools (tiny by-groups) don't cost a dispatch each: a dispatch
  scores a (P, A) grid of P pool-slots x A anchors (P*A = ``chunk``),
  with A sized to the largest pool — thousands of 3-token context
  groups pack ~85 pools into every dispatch instead of padding each to
  256 anchors.
- Greater/equal counts accumulate in separate float32 bins (exact for
  integers < 2^24; guarded against larger cells) that stay on device
  across dispatches via buffer donation; the 0.5 tie weight, per-cell
  division, and mean over cells run on the host in float64 — the host
  scorer's exact arithmetic.
- The kernel is scan-free on purpose: scan-bearing executables compile
  143-383 s on this environment's remote compile service, a flat chunk
  kernel compiles like the small pair executable and the Python chunk
  loop costs one ~50 ms dispatch per chunk. Executables are memoized
  per shape signature module-wide, so e.g. a raw-vs-trained comparison
  over one inventory compiles the kernel once.
- The chunk loop is zero-h2d: every per-chunk table (anchor ids, valid
  masks, chunk->pool map) is staged onto the device ONCE and the
  kernel selects its chunk with a device-resident counter chained
  through the call (bins, counter) -> (bins, counter+1). Fresh numpy
  arguments cost an ~100 ms RPC per dispatch through the dev tunnel
  (CLAUDE.md) — at N=30k that was ~240 RPCs of pure latency; with
  all-device arguments the dispatches pipeline at enqueue rate.

Beyond one buffer, beyond one chip (round-5)
--------------------------------------------
A single (Np, Np) HBM buffer caps the evaluator at the chip's memory
(u16 N=100k = 20 GB > one v5e). Two escapes, both behind the same
handle:

- ROW BLOCKS (:func:`upload_matrix` ``rows_per_block`` /
  ``distance_matrix(device_rows_per_block=...)``): the matrix lives as
  equal-height (rows_pb, Np) buffers. The chunk kernel takes the
  owning block plus its global row offset — anchors gather rows from
  their own block, column gathers (b/x ids) span the full width — and
  the scorer partitions each pass's anchor slots by block host-side,
  threading the SAME donated bins through every block's chunk
  sequence. Equal block heights mean every block shares one compiled
  kernel.
- MESH SHARDING (``upload_matrix(mesh=...)`` / a sharded
  ``device_out`` assembly): one logical matrix, rows sharded over the
  mesh 'data' axis (jax.sharding.NamedSharding); the kernel jit pins
  the matrix to that sharding and everything else replicated, and
  GSPMD inserts the cross-device gathers. Scoring arithmetic is
  unchanged, so results stay bit-identical (asserted on the virtual
  8-CPU mesh in tests and the driver dryrun).
- LAZY HOST-BACKED BLOCKS (``upload_matrix(rows_per_block=...,
  lazy=True)``; automatic on blocked checkpoint resumes): the blocks
  stay numpy/memmap views on the host and each one is staged onto the
  device only for its own chunk sequence, then freed — HBM holds ONE
  block at a time, so a matrix larger than the chip's memory (N=100k
  u16 = 20 GB) scores on a single chip straight off the
  ``distance_matrix`` checkpoint memmap, at the price of one blocked
  h2d re-upload per scoring pass.

Bit-identical to the host scorer
--------------------------------
``abx_error_device`` returns the same dict as ``abx.abx_error`` with a
bit-identical ``error`` (asserted in tests/test_abx_device.py):

- comparisons run in the matrix's own wire dtype — uint16 fixed-point
  tiles compare as integers, which order exactly like their dequantized
  float32 images (the codec is monotone and injective), and float16
  host matrices compare as float16 exactly as the host scorer does;
- per-cell greater/equal counts are exact integers (scatter order
  across packed slots is irrelevant for exact integers), and the final
  reduction happens host-side in float64 with the cells ordered by
  sorted cell key — the host scorer's accumulation order and dtype;
- by-conditioned errors combine per sorted group key as
  ``mean_g * n_cells_g`` partial sums over ``n_cells`` — the host
  by-path's exact arithmetic.

The matrix never leaves the chip: ``distance_matrix(device_out=True)``
assembles the uint16 tile results into an HBM-resident (Np, Np) matrix
as tiles drain (mirroring diagonal tiles exactly as the host drain
does) and the scorer gathers straight from it. A host matrix
(checkpoint resume, the pairs strategy, external arrays) uploads once
in row chunks.

Scale note: within-task bins are per (ca, cx, SPEAKER) cell and
by-conditioned bins are composite rows summed over groups; both fetch
compact — within's rows are the analytically-occupied (s, ca) set by
construction, and the column axis (plus across's row axis) gathers the
occupied submatrix on device first (one fixed-shape executable;
indices padded to power-of-2 buckets with sentinels — the dump row for
rows, the clamped ``Ccols`` for columns) before the host scatters it
back into a zero matrix. Bit-identical by construction — every cell
the scorer reads has a positive analytic count and therefore sits
inside the occupied grid; counts outside it are never-read (ca, ca)
diagonal dump cells.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from abnet3_tpu.utils import pow2_bucket

__all__ = ["DeviceMatrix", "upload_matrix", "abx_error_device",
           "device_scorable"]

# anchor slots per dispatch: P pools x A anchors with P*A = 256 keeps
# the (P, A, max_b, max_x) comparison cube tens of MB at ZeroSpeech
# shapes (max_b ~ 64, max_x ~ 1500 -> 25M entries) while each ~50 ms
# dispatch scores 256 * max_x columns
_CHUNK = 256

# float32 bins hold exact integer counts only below 2^24; a single cell
# accumulating more triplets than this would round. Real cells are
# orders of magnitude smaller (the N=30k synthetic inventory averages
# 43 triplets/cell) — the guard refuses loudly instead of rounding.
_F32_EXACT = 1 << 24


def _compact_enabled() -> bool:
    """Occupied-submatrix fetch compaction opt-out (escape hatch /
    A/B): ``ABNET3_ABX_COMPACT=0`` forces full-bin fetches. Results
    are bit-identical either way (module docstring)."""
    return os.environ.get("ABNET3_ABX_COMPACT", "1") != "0"


class DeviceMatrix:
    """Handle to an (Np, Np) device-resident distance matrix.

    Storage is a list of equal-height row ``blocks`` (``(rows_pb, Np)``
    each, wire-dtype values: uint16 fixed point for the angular
    metrics, float32 for dtw_kl, or whatever dtype a host matrix
    uploaded as) starting at global rows ``row_starts``; the common
    single-buffer case is one block, exposed as ``.array`` for
    callers/tests that treat the handle as one array. ``n`` is the true
    token count — buffers may pad beyond it (whole tiles / equal
    blocks / mesh divisibility) so device writes stay in-bounds.
    ``mesh`` is set when the (single) block is row-sharded over the
    mesh 'data' axis — the scorer then pins its kernels to that
    sharding."""

    def __init__(self, array=None, n: int = 0, blocks=None,
                 row_starts: Optional[Sequence[int]] = None, mesh=None,
                 lazy: bool = False):
        if blocks is None:
            assert array is not None
            blocks = [array]
            row_starts = [0]
        assert len(blocks) == len(row_starts)
        self.blocks = list(blocks)
        self.row_starts = [int(r) for r in row_starts]
        self.n = int(n)
        self.mesh = mesh
        # lazy: blocks are HOST arrays (numpy / np.memmap slices); the
        # scorer stages each block onto the device only for its own
        # chunk sequence and frees it after — the matrix as a whole
        # never has to fit HBM (N=100k u16 = 20 GB scores on a 16 GB
        # chip straight off the checkpoint memmap)
        self.lazy = bool(lazy)
        if mesh is not None:
            assert len(self.blocks) == 1, \
                "mesh sharding and host-side row blocks are exclusive"
            assert not lazy, "mesh sharding and lazy blocks are " \
                             "exclusive"

    @property
    def array(self):
        """The single storage buffer (row-blocked handles have none —
        gather from ``.blocks``)."""
        assert len(self.blocks) == 1, "row-blocked matrix has no " \
                                      "single .array; use .blocks"
        return self.blocks[0]

    @property
    def rows_per_block(self) -> int:
        return int(self.blocks[0].shape[0])

    def block_of(self, row: int) -> int:
        """Index of the block owning global ``row``."""
        return min(row // self.rows_per_block, len(self.blocks) - 1)

    def __len__(self):
        return self.n


def _replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec())


def _row_sharded(mesh):
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec("data", None))


def _stage(x, mesh):
    """Host array -> device. With a mesh: explicitly replicated, so
    every scorer input lives on the same device set as the sharded
    matrix (mixed device sets are a jit error)."""
    import jax
    if mesh is None:
        return jax.device_put(x)
    return jax.device_put(x, _replicated(mesh))


def upload_matrix(D: np.ndarray, chunk_rows: int = 4096, mesh=None,
                  rows_per_block: Optional[int] = None,
                  lazy: bool = False) -> DeviceMatrix:
    """Host (N, N) matrix -> device, in row chunks (one h2d RPC each; a
    single multi-GB transfer is where the dev tunnel misbehaves).
    float64 downcasts to float32; every other dtype uploads as-is so
    device comparisons match host comparisons value-for-value.

    ``mesh``: row-shard the uploaded matrix over the mesh 'data' axis
    (rows zero-pad to divide it). ``rows_per_block``: store as
    equal-height row blocks instead (the > one-HBM-buffer path;
    exclusive with ``mesh``). ``lazy`` (with ``rows_per_block``): keep
    the blocks HOST-resident — numpy views of ``D``, which may be an
    ``np.memmap`` (a ``distance_matrix`` checkpoint) — and let the
    scorer stage one block at a time, so matrices LARGER THAN HBM
    score on a single chip; the per-pass h2d re-upload is the price
    (see the module docstring)."""
    import jax
    import jax.numpy as jnp

    if D.dtype == np.float64:
        D = D.astype(np.float32)
    if lazy:
        assert rows_per_block is not None and mesh is None, \
            "lazy needs rows_per_block (and no mesh)"
        N = D.shape[0]
        rows_per_block = min(rows_per_block, N)
        blocks = [D[r:r + rows_per_block]
                  for r in range(0, N, rows_per_block)]
        starts = list(range(0, N, rows_per_block))
        return DeviceMatrix(blocks=blocks, row_starts=starts, n=N,
                            lazy=True)
    N = D.shape[0]
    if mesh is not None and mesh.size > 1:
        assert rows_per_block is None, \
            "mesh sharding and rows_per_block are exclusive"
        n_data = mesh.shape["data"]
        Np = -(-N // n_data) * n_data
        sh = _row_sharded(mesh)
        if Np != N:
            Dp = np.zeros((Np, N), D.dtype)
            Dp[:N] = D
            D = Dp
        return DeviceMatrix(jax.device_put(np.ascontiguousarray(D), sh),
                            n=N, mesh=mesh)
    if rows_per_block is not None and rows_per_block < N:
        blocks, starts = [], []
        for r0 in range(0, N, rows_per_block):
            blk = D[r0:r0 + rows_per_block]
            if blk.shape[0] < rows_per_block:  # equal heights: one
                pad = np.zeros((rows_per_block - blk.shape[0], N),
                               D.dtype)            # compiled kernel
                blk = np.concatenate([blk, pad], axis=0)
            parts = [jax.device_put(np.ascontiguousarray(
                blk[r:r + chunk_rows]))
                for r in range(0, rows_per_block, chunk_rows)]
            blocks.append(parts[0] if len(parts) == 1
                          else jnp.concatenate(parts, axis=0))
            starts.append(r0)
        return DeviceMatrix(blocks=blocks, row_starts=starts, n=N)
    if N <= chunk_rows:
        return DeviceMatrix(jax.device_put(np.ascontiguousarray(D)), N)
    parts = [jax.device_put(np.ascontiguousarray(D[r:r + chunk_rows]))
             for r in range(0, N, chunk_rows)]
    return DeviceMatrix(jnp.concatenate(parts, axis=0), N)


def _stage_lazy_block(blk: np.ndarray, rows_pb: int,
                      chunk_rows: int = 4096):
    """Host row block (numpy / memmap view) -> one device buffer,
    padded to the shared block height (so every block reuses one
    compiled kernel) and uploaded in row chunks (single multi-GB h2d
    transfers misbehave through the dev tunnel)."""
    import jax
    import jax.numpy as jnp

    parts = [jax.device_put(np.ascontiguousarray(blk[r:r + chunk_rows]))
             for r in range(0, blk.shape[0], chunk_rows)]
    short = rows_pb - blk.shape[0]
    if short > 0:
        parts.append(jnp.zeros((short, blk.shape[1]), blk.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                            axis=0)


def _compare_dtype(wire_dtype):
    """Integer wires compare as int32 (uint16 order == dequantized
    float32 order); float wires as float32 (float16 values compare
    identically to their exact float32 images)."""
    import jax.numpy as jnp
    return (jnp.int32 if np.issubdtype(np.dtype(wire_dtype), np.integer)
            else jnp.float32)


# executables memoized per shape signature: by-group passes and
# repeated same-inventory calls (raw vs trained embeddings) reuse one
# compile; jit's own shape cache additionally specializes per matrix-
# block height, which equal-height blocks keep to one executable
_KERNEL_CACHE: Dict[Tuple, object] = {}


def _chunk_kernel(Crows: int, Ccols: int, max_b: int, max_x: int,
                  P: int, A: int, wire_dtype, mesh=None):
    """One jitted dispatch: score chunk ``i`` — a (P, A) grid of pool
    slots read from device-staged chunk tables with a device-resident
    counter — against each slot's B sets and its pool's class-sorted X
    table, accumulating greater/equal counts into donated
    (Crows+1, Ccols) float32 bins (row Crows is the dump row for padded
    anchors). Rows are composite (by-group, class) ids (within task:
    occupied (speaker, class) ids); columns are group-local class ids.
    ``Dq`` is the anchor rows' storage block and ``row_off`` its global
    starting row (0 for a whole-matrix block); with a ``mesh`` the jit
    pins ``Dq`` to the row-sharded layout and the rest replicated, and
    GSPMD inserts the cross-device row gathers. Every argument is
    device-resident, so the call enqueues without a single h2d RPC
    (module docstring)."""
    import jax
    import jax.numpy as jnp

    key = (Crows, Ccols, max_b, max_x, P, A,
           np.dtype(wire_dtype).str, jax.default_backend(), mesh)
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    cdt = _compare_dtype(wire_dtype)

    def step(Dq, row_off, cls_tab, b_ids_tab, b_cnt_tab, x_ids_tab,
             x_seg_tab, x_cnt_tab, sel_tab, valid_tab, pool_tab, state):
        gt_bins, eq_bins, i = state
        a_ids = sel_tab[i]                              # (P, A)
        a_valid = valid_tab[i]                          # (P, A) bool
        pools = pool_tab[i]                             # (P,)
        x_ids = x_ids_tab[pools]                        # (P, max_x)
        x_seg = x_seg_tab[pools]
        x_cnt = x_cnt_tab[pools]                        # (P,)
        flat = a_ids.reshape(-1)                        # (P*A,)
        # one row gather per anchor (block-local), then column gathers
        # out of the rows (full matrix width)
        rows = Dq[flat - row_off].astype(cdt).reshape(P, A, -1)
        b_ids = b_ids_tab[flat].reshape(P, A, max_b)
        dab = jnp.take_along_axis(rows, b_ids, axis=2)
        dax = jnp.take_along_axis(
            rows, jnp.broadcast_to(x_ids[:, None, :], (P, A, max_x)),
            axis=2)
        vb = (jnp.arange(max_b)[None, None, :]
              < b_cnt_tab[flat].reshape(P, A)[:, :, None])
        # padded X slots are masked here; the anchor's own class lands
        # in the (ca, ca) diagonal bin, which is never read
        vx = ((jnp.arange(max_x)[None, None, :] < x_cnt[:, None, None])
              & a_valid[:, :, None])
        gt = jnp.sum((dab[:, :, :, None] > dax[:, :, None, :])
                     & vb[:, :, :, None], axis=2)       # (P, A, max_x)
        eq = jnp.sum((dab[:, :, :, None] == dax[:, :, None, :])
                     & vb[:, :, :, None], axis=2)
        gt = jnp.where(vx, gt, 0).astype(jnp.float32)
        eq = jnp.where(vx, eq, 0).astype(jnp.float32)
        # stage 1: collapse each slot's class-sorted X axis to group-
        # local class columns (segment ids shared within a pool)
        seg = jax.vmap(lambda v, s: jax.ops.segment_sum(
            v.T, s, num_segments=Ccols + 1))
        gt_c = seg(gt, x_seg)                           # (P, Ccols+1, A)
        eq_c = seg(eq, x_seg)
        # stage 2: scatter-add P*A anchor rows into the cell bins
        # (duplicate rows across slots add exact integers — order-free)
        row = jnp.where(a_valid, cls_tab[a_ids], Crows).reshape(-1)
        gt_rows = gt_c[:, :Ccols, :].transpose(0, 2, 1).reshape(-1, Ccols)
        eq_rows = eq_c[:, :Ccols, :].transpose(0, 2, 1).reshape(-1, Ccols)
        gt_bins = gt_bins.at[row].add(gt_rows)
        eq_bins = eq_bins.at[row].add(eq_rows)
        return gt_bins, eq_bins, i + 1

    donate = () if jax.default_backend() == "cpu" else (11,)
    if mesh is None:
        fn = jax.jit(step, donate_argnums=donate)
    else:
        rep = _replicated(mesh)
        in_sh = (_row_sharded(mesh),) + (rep,) * 10 + ((rep, rep, rep),)
        fn = jax.jit(step, donate_argnums=donate, in_shardings=in_sh,
                     out_shardings=(rep, rep, rep))
    _KERNEL_CACHE[key] = fn
    return fn


def _sub_gather(R: int, Cc: int, mesh=None):
    """Jitted ``(gt_bins, eq_bins, ridx(R,), cidx(Cc,)) ->
    ((R, Cc) x 2)`` occupied-submatrix gather, memoized per shape so
    every pass of a run reuses ONE executable (fresh shapes would each
    pay a remote compile through the dev tunnel, CLAUDE.md). Row
    padding indexes the dump row; column padding uses the sentinel
    ``Ccols``, which jax's clamping gather maps to the last column —
    both discarded host-side."""
    import jax

    key = ("subgather", R, Cc, jax.default_backend(), mesh)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        g = lambda gt, eq, ridx, cidx: (gt[ridx][:, cidx],
                                        eq[ridx][:, cidx])
        if mesh is None:
            fn = jax.jit(g)
        else:
            rep = _replicated(mesh)
            fn = jax.jit(g, in_shardings=(rep,) * 4,
                         out_shardings=(rep, rep))
        _KERNEL_CACHE[key] = fn
    return fn


def _fetch_rows(dev, n_rows: int, n_cols: int,
                itemsize: int = 4) -> np.ndarray:
    """Fetch a (n_rows, n_cols) device array in <= 2 MB row slices
    (d2h fetches past ~3 MB can stall for minutes through the dev
    tunnel, CLAUDE.md)."""
    rows_per = max(1, (2 << 20) // max(1, n_cols * itemsize))
    if n_rows <= rows_per:
        return np.asarray(dev)
    parts = []
    for r in range(0, n_rows, rows_per):
        s = dev[r:r + rows_per]
        try:
            s.copy_to_host_async()
        except AttributeError:
            pass
        parts.append(s)
    return np.concatenate([np.asarray(p) for p in parts], axis=0)


def _dense_ids(values: np.ndarray) -> Tuple[List, np.ndarray]:
    """values -> (sorted unique list, dense int32 ids in sorted order).
    Sorted order preserves the host scorer's sorted-cell-key order."""
    uniq = sorted(set(values.tolist()))
    pos = {v: i for i, v in enumerate(uniq)}
    return uniq, np.asarray([pos[v] for v in values.tolist()], np.int32)


def _composite_classes(labels: np.ndarray, by: Optional[Sequence]):
    """Dense COMPOSITE class ids over (by-group, label), group-major:
    group g's classes occupy composite rows [row_off[g], row_off[g+1])
    in sorted-label order (= the host scorer's per-group cell order).

    Returns (group_keys sorted, gid (N,), cls (N,) composite ids,
    row_off (G+1,), group_classes: per group the sorted label list)."""
    N = len(labels)
    if by is None:
        keys = [None]
        gid = np.zeros(N, np.int32)
    else:
        assert len(by) == N
        # plain-Python key handling: the host scorer sorts the raw by
        # keys (tuples), and np.asarray would mangle equal-length
        # tuples into a 2-D array
        keys = sorted(set(by))
        pos = {k: i for i, k in enumerate(keys)}
        gid = np.asarray([pos[b] for b in by], np.int32)
    G = len(keys)
    group_classes: List[List] = []
    row_off = np.zeros(G + 1, np.int64)
    cls = np.zeros(N, np.int32)
    for g in range(G):
        idx = np.flatnonzero(gid == g)
        uniq, local = _dense_ids(labels[idx])
        cls[idx] = local + row_off[g]
        group_classes.append(uniq)
        row_off[g + 1] = row_off[g] + len(uniq)
    return keys, gid, cls, row_off, group_classes


def _pool_tables(cls: np.ndarray, spk: np.ndarray, gid: np.ndarray,
                 row_off: np.ndarray, Ccols: int):
    """Per-(speaker, by-group) class-sorted X candidate tables:
    x_ids (P, max_x) GLOBAL token ids (pad 0, masked), x_seg (P, max_x)
    group-LOCAL class segment ids (pad Ccols = dump segment),
    x_cnt (P,), pool_spk (P,), plus token -> pool id (N,)."""
    N = len(cls)
    key = spk.astype(np.int64) * (int(gid.max()) + 1) + gid
    order = np.lexsort((cls, key))
    uniq, starts = np.unique(key[order], return_index=True)
    bounds = np.append(starts, N)
    P = len(uniq)
    counts = (bounds[1:] - bounds[:-1]).astype(np.int32)
    max_x = max(int(counts.max()) if P else 1, 1)
    x_ids = np.zeros((P, max_x), np.int32)
    x_seg = np.full((P, max_x), Ccols, np.int32)
    pool_spk = np.zeros(P, np.int32)
    pool_of = np.zeros(N, np.int32)
    for p in range(P):
        sel = order[bounds[p]:bounds[p + 1]]
        n = len(sel)
        x_ids[p, :n] = sel
        g = gid[sel[0]]
        x_seg[p, :n] = cls[sel] - row_off[g]
        pool_spk[p] = spk[sel[0]]
        pool_of[sel] = p
    return x_ids, x_seg, counts, pool_spk, pool_of, max_x


def _anchor_b_tables(cls: np.ndarray, spk: np.ndarray, Crows: int,
                     task: str):
    """Per-anchor B-set tables: b_ids (N, max_b) int32 GLOBAL token ids
    (pad 0, masked) and b_cnt (N,). Across: same composite class, other
    speakers. Within: same composite class, same speaker, anchor
    excluded. Composite classes never span by-groups, so B sets respect
    the conditioning for free."""
    N = len(cls)
    order = np.lexsort((spk, cls))
    starts = np.searchsorted(cls[order], np.arange(Crows))
    bounds = np.append(starts, N)
    b_lists: List[Optional[np.ndarray]] = [None] * N
    max_b = 1
    for c in range(Crows):
        idx = order[bounds[c]:bounds[c + 1]]
        if len(idx) < 2:
            continue
        spks_c = spk[idx]
        for u in np.unique(spks_c):
            anchors = idx[spks_c == u]
            if task == "across":
                blist = idx[spks_c != u]
                if len(blist):
                    for a in anchors:
                        b_lists[a] = blist
                    max_b = max(max_b, len(blist))
            else:
                if len(anchors) > 1:
                    for a in anchors:
                        b_lists[a] = anchors[anchors != a]
                    max_b = max(max_b, len(anchors) - 1)
    b_ids = np.zeros((N, max_b), np.int32)
    b_cnt = np.zeros(N, np.int32)
    for a in range(N):
        bl = b_lists[a]
        if bl is not None:
            b_ids[a, :len(bl)] = bl
            b_cnt[a] = len(bl)
    return b_ids, b_cnt, max_b


def _cell_counts(n_cs: np.ndarray, task: str) -> np.ndarray:
    """Analytic per-cell triplet counts from a (C, S) class-speaker
    histogram, float64 (exact: integer products far below 2^53).

    across (C, C):    cnt[ca,cx] = sum_s n[ca,s]*(N_ca - n[ca,s])*n[cx,s]
    within (C, C, S): cnt[ca,cx,s] = n[ca,s]*(n[ca,s]-1)*n[cx,s]"""
    A = n_cs.astype(np.float64)
    C = A.shape[0]
    if task == "across":
        n_class = A.sum(axis=1, keepdims=True)
        cnt = (A * (n_class - A)) @ A.T
        np.fill_diagonal(cnt, 0.0)
    else:
        cnt = (A * np.maximum(A - 1.0, 0.0))[:, None, :] * A[None, :, :]
        cnt[np.arange(C), np.arange(C), :] = 0.0
    return cnt


def device_scorable(labels: Sequence, speakers: Sequence,
                    task: str = "across",
                    by: Optional[Sequence] = None) -> bool:
    """True when the device scorer can count this inventory exactly
    (every cell below 2^24 triplets — the float32-bin exactness bound).
    Cheap (histogram math only): callers that want to skip the host
    matrix entirely check this BEFORE the distance stage, so no
    fallback ever needs a matrix that was never fetched. Without ``by``
    the check is conservative for by-conditioned runs (group cells are
    subsets of unconditioned cells)."""
    labels = np.asarray(labels)
    speakers = np.asarray(speakers)
    if not len(labels):
        return True
    _, spk = _dense_ids(speakers)
    _, gid, cls, row_off, _ = _composite_classes(labels, by)
    S = int(spk.max()) + 1
    Crows = int(row_off[-1])
    n_cs = np.zeros((Crows, S), np.int64)
    np.add.at(n_cs, (cls, spk), 1)
    worst = 0.0
    for g in range(len(row_off) - 1):
        cnt = _cell_counts(n_cs[row_off[g]:row_off[g + 1]], task)
        if cnt.size:
            worst = max(worst, float(cnt.max()))
    return worst < _F32_EXACT


def abx_error_device(D, labels: Sequence, speakers: Sequence,
                     task: str = "across",
                     by: Optional[Sequence] = None,
                     chunk: int = _CHUNK,
                     return_cells: bool = False) -> Dict:
    """Device-backed twin of :func:`abnet3_tpu.eval.abx.abx_error` —
    same inputs plus :class:`DeviceMatrix` handles for ``D``, same
    result dict, bit-identical ``error`` (module docstring).
    ``return_cells=True`` adds the per-cell ``"cells"`` breakdown —
    ``(key, score, n_triplets)`` in sorted-key order, bit-identical to
    the host scorer's (the bins hold exact integer counts and the
    per-cell division is the same float64 op).

    ``D``: a host (N, N) matrix (uploaded once, compared in its own
    dtype) or a :class:`DeviceMatrix` from
    ``distance_matrix(device_out=True)`` (no upload at all) — including
    row-blocked and mesh-sharded handles (module docstring). ``by``
    conditioning runs in the same single pass over the full matrix —
    composite bin rows keep each group's cells separate; the within
    task runs as one pass too (occupied (speaker, class) bin rows)."""
    assert task in ("across", "within")
    labels = np.asarray(labels)
    speakers = np.asarray(speakers)
    N = len(labels)
    if isinstance(D, DeviceMatrix):
        assert D.n == N, (D.n, N)
        dm = D
    else:
        assert D.shape == (N, N)
        dm = None  # upload lazily, only if there are cells to score
    assert len(speakers) == N

    keys, gid, cls, row_off, group_classes = _composite_classes(labels,
                                                                by)
    spks, spk = _dense_ids(speakers)
    G, S = len(keys), len(spks)
    Crows = int(row_off[-1])
    Ccols = max(int(row_off[g + 1] - row_off[g]) for g in range(G))
    n_cs = np.zeros((Crows, S), np.int64)
    np.add.at(n_cs, (cls, spk), 1)

    cnts = [_cell_counts(n_cs[row_off[g]:row_off[g + 1]], task)
            for g in range(G)]
    if not any((c > 0).any() for c in cnts):
        out = {"error": float("nan"), "n_cells": 0, "n_triplets": 0}
        if return_cells:
            out["cells"] = []
        return out
    if max(float(c.max()) for c in cnts if c.size) >= _F32_EXACT:
        raise ValueError(
            "a single ABX cell carries >= 2^24 triplets — float32 "
            "device bins would round its counts; score this inventory "
            "with the host path (abx.abx_error)")
    if dm is None:
        dm = upload_matrix(D)
    mesh = dm.mesh

    x_ids, x_seg, x_cnt, pool_spk, pool_of, max_x = _pool_tables(
        cls, spk, gid, row_off, Ccols)
    b_ids, b_cnt, max_b = _anchor_b_tables(cls, spk, Crows, task)
    n_pools = len(x_cnt)

    # bin ROW id per token: the across task scatters into composite
    # class rows; the within task into dense OCCUPIED (speaker,
    # composite-class) rows so one pass covers every speaker's cells
    if task == "across":
        n_rows = Crows
        row_tab = cls
    else:
        occ_sc = np.zeros((S, Crows), bool)   # occupied (s, ca) rows
        for g in range(G):
            # (Cg, S) any-triplet mask over the anchor axis
            m = (cnts[g] > 0).any(axis=1)
            occ_sc[:, row_off[g]:row_off[g + 1]] = m.T
        lk = np.full((S, Crows), -1, np.int64)
        occ_s, occ_r = np.nonzero(occ_sc)     # s-major row order
        n_rows = len(occ_s)
        lk[occ_s, occ_r] = np.arange(n_rows)
        row_tab = lk[spk, cls]
        row_tab = np.where(row_tab < 0, n_rows, row_tab) \
            .astype(np.int32)                 # unoccupied -> dump row

    # slot geometry: A anchors per pool slot, P slots per dispatch.
    # Large pools (unconditioned inventories) get A = chunk, P = 1 —
    # the round-4 hardware-validated shape; tiny by-group pools pack
    # many slots per dispatch instead of padding each to `chunk`.
    A = min(chunk, pow2_bucket(int(x_cnt.max()), minimum=8))
    P = max(1, chunk // A)

    wire = np.dtype(dm.blocks[0].dtype)
    kernel = _chunk_kernel(n_rows, Ccols, max_b, max_x, P, A, wire,
                           mesh=mesh)

    # static tables: one h2d each for the whole scoring run
    statics = tuple(_stage(a, mesh) for a in (
        row_tab, b_ids, b_cnt, x_ids, x_seg, x_cnt.astype(np.int32)))
    by_pool = [np.flatnonzero(pool_of == p) for p in range(n_pools)]
    rows_pb = dm.rows_per_block
    n_blocks = len(dm.blocks)

    def run_bins(occ_rows=None,
                 occ_cols=None) -> Tuple[np.ndarray, np.ndarray]:
        """Score every pool's anchors into fresh bins; returns host
        float64 (n_rows, Ccols) greater/equal counts. With a
        row-blocked matrix the anchor slots partition by owning block
        host-side and the donated bins thread through each block's
        chunk sequence (same kernel — equal block heights).
        ``occ_rows`` / ``occ_cols`` (sorted int32 anchor rows / local
        class columns with any triplets, padded to shared bucket
        lengths with the ``n_rows`` / ``Ccols`` sentinels) compact the
        d2h fetch to the occupied submatrix (module docstring)."""
        per_block: List[Tuple[List, List, List]] = \
            [([], [], []) for _ in range(n_blocks)]
        for p in range(n_pools):
            anchors = by_pool[p]
            if n_blocks > 1:
                owners = np.minimum(anchors // rows_pb, n_blocks - 1)
                splits = [anchors[owners == b] for b in range(n_blocks)]
            else:
                splits = [anchors]
            for b, blk_anchors in enumerate(splits):
                sels, valids, pool_ids = per_block[b]
                for c0 in range(0, len(blk_anchors), A):
                    sel = blk_anchors[c0:c0 + A].astype(np.int32)
                    a_valid = np.ones(A, bool)
                    pad = A - len(sel)
                    if pad:
                        a_valid[len(sel):] = False
                        sel = np.concatenate(
                            [sel, np.zeros(pad, np.int32)])
                    sels.append(sel)
                    valids.append(a_valid)
                    pool_ids.append(p)
        state = (_stage(np.zeros((n_rows + 1, Ccols), np.float32),
                        mesh),
                 _stage(np.zeros((n_rows + 1, Ccols), np.float32),
                        mesh),
                 _stage(np.zeros((), np.int32), mesh))
        any_slots = False
        for b in range(n_blocks):
            sels, valids, pool_ids = per_block[b]
            if not sels:
                continue
            any_slots = True
            # pad the slot list to whole (P,) chunks with all-invalid
            # slots; pad anchors use id 0, which may live outside this
            # block — the block-local gather clamps and a_valid masks
            while len(sels) % P:
                sels.append(np.zeros(A, np.int32))
                valids.append(np.zeros(A, bool))
                pool_ids.append(0)
            n_chunks = len(sels) // P
            # per-chunk tables: staged in ONE h2d each; the kernel
            # indexes them with the device counter chained through
            # state (reset per block — tables are per block)
            chunk_tabs = (
                _stage(np.stack(sels).reshape(n_chunks, P, A), mesh),
                _stage(np.stack(valids).reshape(n_chunks, P, A), mesh),
                _stage(np.asarray(pool_ids, np.int32)
                       .reshape(n_chunks, P), mesh))
            row_off_d = _stage(np.int32(dm.row_starts[b]), mesh)
            state = (state[0], state[1],
                     _stage(np.zeros((), np.int32), mesh))
            if dm.lazy:
                # host-backed block: stage for THIS pass only (chunked
                # h2d; padded to the shared height so one executable
                # serves every block), freed before the next block
                blk_dev = _stage_lazy_block(dm.blocks[b], rows_pb)
            else:
                blk_dev = dm.blocks[b]
            for _ in range(n_chunks):
                state = kernel(blk_dev, row_off_d, *statics,
                               *chunk_tabs, state)
            if dm.lazy:
                # the bins fetch below waits on the whole chain; drop
                # the only reference so HBM frees as soon as this
                # block's last chunk retires
                del blk_dev
        if not any_slots:
            z = np.zeros((n_rows, Ccols), np.float64)
            return z, z.copy()
        gt_bins, eq_bins, _ = state
        if occ_rows is not None or occ_cols is not None:
            rs = (occ_rows if occ_rows is not None
                  else np.arange(n_rows, dtype=np.int32))
            cs = (occ_cols if occ_cols is not None
                  else np.arange(Ccols, dtype=np.int32))
            sub = _sub_gather(len(rs), len(cs), mesh=mesh)(
                gt_bins, eq_bins, _stage(rs, mesh), _stage(cs, mesh))
            mr, mc = rs < n_rows, cs < Ccols  # drop sentinel padding
            grid = np.ix_(rs[mr], cs[mc])
            gt = np.zeros((n_rows, Ccols), np.float32)
            eq = np.zeros((n_rows, Ccols), np.float32)
            gt[grid] = _fetch_rows(sub[0], len(rs), len(cs))[mr][:, mc]
            eq[grid] = _fetch_rows(sub[1], len(rs), len(cs))[mr][:, mc]
        else:
            gt = _fetch_rows(gt_bins, n_rows + 1, Ccols)[:n_rows]
            eq = _fetch_rows(eq_bins, n_rows + 1, Ccols)[:n_rows]
        return gt.astype(np.float64), eq.astype(np.float64)

    def pad_occ(idx: np.ndarray, R: int, sentinel: int) -> np.ndarray:
        """Pad one occupied-index set to the shared bucket length with
        the sentinel (so every pass reuses one gather executable)."""
        out = np.full(R, sentinel, np.int32)
        out[:len(idx)] = idx
        return out

    def occ_cols_of(blocks) -> np.ndarray:
        """Union of occupied LOCAL class columns over per-group count
        blocks ((Cg, Cg) each)."""
        cm = np.zeros(Ccols, bool)
        for blk in blocks:
            cm[np.flatnonzero((blk > 0).any(axis=0))] = True
        return np.flatnonzero(cm)

    def group_scores_across(err: np.ndarray, g: int) -> np.ndarray:
        """Group g's occupied-cell scores in sorted (ca, cx) order —
        a row-major boolean slice of the composite-row block."""
        lo, hi = int(row_off[g]), int(row_off[g + 1])
        Cg = hi - lo
        cnt = cnts[g]
        occ = cnt > 0
        return err[lo:hi, :Cg][occ] / cnt[occ]

    def group_cells_across(err: np.ndarray, g: int) -> List[Tuple]:
        """(key, score, count) rows for group g's occupied cells —
        row-major over the sorted-label block = sorted (ca, cx) order,
        scores elementwise-identical to group_scores_across."""
        lo, hi = int(row_off[g]), int(row_off[g + 1])
        cnt = cnts[g]
        names = group_classes[g]
        pfx = (() if by is None else
               (keys[g] if isinstance(keys[g], tuple) else (keys[g],)))
        return [(pfx + (names[a], names[x]),
                 err[lo + a, x] / cnt[a, x], int(cnt[a, x]))
                for a, x in zip(*np.nonzero(cnt > 0))]

    if task == "across":
        if _compact_enabled():
            occ = np.concatenate(
                [np.flatnonzero((cnts[g] > 0).any(axis=1)) + row_off[g]
                 for g in range(G)])
            occ_c = occ_cols_of(cnts)
            R = pow2_bucket(len(occ), minimum=8)
            Rc = pow2_bucket(len(occ_c), minimum=8)
        else:  # skip the occupancy scans nothing would use
            occ = occ_c = None
            R, Rc = Crows, Ccols
        gt, eq = run_bins(
            pad_occ(occ, R, Crows) if R < Crows else None,
            pad_occ(occ_c, Rc, Ccols) if Rc < Ccols else None)
        err = gt + 0.5 * eq
        if by is None:
            scores = group_scores_across(err, 0)
            out = {"error": (float(np.mean(scores)) if scores.size
                             else float("nan")),
                   "n_cells": int((cnts[0] > 0).sum()),
                   "n_triplets": int(cnts[0].sum())}
            if return_cells:
                out["cells"] = group_cells_across(err, 0)
            return out
        # host by-path arithmetic: sum of per-group mean * n_cells
        err_sum, n_cells, n_trip = 0.0, 0, 0
        by_cells: List[Tuple] = []
        for g in range(G):
            scores = group_scores_across(err, g)
            if scores.size:
                err_sum += float(np.mean(scores)) * scores.size
                n_cells += int(scores.size)
                n_trip += int(cnts[g].sum())
            if return_cells:
                by_cells.extend(group_cells_across(err, g))
        out = {"error": (err_sum / n_cells if n_cells
                         else float("nan")),
               "n_cells": n_cells, "n_triplets": n_trip}
        if return_cells:
            out["cells"] = by_cells
        return out

    # within: cells are (ca, cx, s); the bins already hold every
    # speaker's cells (occupied (s, ca) rows — one pass, one fetch)
    if _compact_enabled():
        occ_c = occ_cols_of([(cnts[g] > 0).any(axis=2)
                             for g in range(G)])
        Rc = pow2_bucket(len(occ_c), minimum=8)
    else:  # skip the O(C^2 S) occupancy scan nothing would use
        occ_c, Rc = None, Ccols
    gt, eq = run_bins(
        None, pad_occ(occ_c, Rc, Ccols) if Rc < Ccols else None)
    err = gt + 0.5 * eq
    # occupied row i is speaker occ_s[i], composite class occ_r[i]
    g_of = (np.searchsorted(row_off, occ_r, side="right") - 1
            if n_rows else np.zeros(0, np.int64))
    per_group: List[List[Tuple[Tuple, float, int]]] = [[] for _ in
                                                       range(G)]
    trip_group = [int(cnts[g].sum()) for g in range(G)]
    for i in range(n_rows):
        s, g = int(occ_s[i]), int(g_of[i])
        ca = int(occ_r[i] - row_off[g])
        cnt_row = cnts[g][ca, :, s]           # (Cg,)
        names = group_classes[g]
        for cx in np.flatnonzero(cnt_row > 0):
            per_group[g].append(
                ((names[ca], names[int(cx)], spks[s]),
                 err[i, cx] / cnt_row[cx], int(cnt_row[cx])))
    if by is None:
        cell_list = per_group[0]
        cell_list.sort(key=lambda kv: kv[0])
        scores = np.asarray([v for _, v, _ in cell_list], np.float64)
        out = {"error": (float(np.mean(scores)) if len(cell_list)
                         else float("nan")),
               "n_cells": len(cell_list),
               "n_triplets": trip_group[0]}
        if return_cells:
            out["cells"] = cell_list
        return out
    err_sum, n_cells, n_trip = 0.0, 0, 0
    by_cells: List[Tuple] = []
    for g in range(G):
        cell_list = per_group[g]
        if not cell_list:
            continue
        cell_list.sort(key=lambda kv: kv[0])
        scores = np.asarray([v for _, v, _ in cell_list], np.float64)
        err_sum += float(np.mean(scores)) * len(cell_list)
        n_cells += len(cell_list)
        n_trip += trip_group[g]
        if return_cells:
            pfx = keys[g] if isinstance(keys[g], tuple) else (keys[g],)
            by_cells.extend((pfx + k, v, c) for k, v, c in cell_list)
    out = {"error": (err_sum / n_cells if n_cells else float("nan")),
           "n_cells": n_cells, "n_triplets": n_trip}
    if return_cells:
        out["cells"] = by_cells
    return out
