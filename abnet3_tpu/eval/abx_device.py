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

Scale note: the ``within`` task bins per (ca, cx, SPEAKER) cell, so it
fetches one (Crows, Ccols) bin pair per speaker, and by-conditioned
runs fetch composite-row bins whose row count is the SUM of per-group
class counts. Both fetches compact to the OCCUPIED anchor rows and
X-class columns first: the occupied sets are known analytically from
the cell-count histogram, a device-side gather (one fixed-shape
executable shared by every speaker pass; indices padded to power-of-2
buckets with sentinels — the dump row for rows, the clamped ``Ccols``
for columns) pulls just the occupied submatrix, and the host scatters
it back into a zero matrix. Bit-identical by construction — every cell
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

    ``array`` holds wire-dtype values (uint16 fixed point for the
    angular metrics, float32 for dtw_kl, or whatever dtype a host
    matrix uploaded as); ``n`` is the true token count — the buffer may
    be padded up to whole tiles so tile writes stay in-bounds under
    dynamic_update_slice's start clamping."""

    def __init__(self, array, n: int):
        self.array = array
        self.n = int(n)

    def __len__(self):
        return self.n


def upload_matrix(D: np.ndarray, chunk_rows: int = 4096) -> DeviceMatrix:
    """Host (N, N) matrix -> device, in row chunks (one h2d RPC each; a
    single multi-GB transfer is where the dev tunnel misbehaves).
    float64 downcasts to float32; every other dtype uploads as-is so
    device comparisons match host comparisons value-for-value."""
    import jax
    import jax.numpy as jnp

    if D.dtype == np.float64:
        D = D.astype(np.float32)
    N = D.shape[0]
    if N <= chunk_rows:
        return DeviceMatrix(jax.device_put(np.ascontiguousarray(D)), N)
    parts = [jax.device_put(np.ascontiguousarray(D[r:r + chunk_rows]))
             for r in range(0, N, chunk_rows)]
    return DeviceMatrix(jnp.concatenate(parts, axis=0), N)


def _compare_dtype(wire_dtype):
    """Integer wires compare as int32 (uint16 order == dequantized
    float32 order); float wires as float32 (float16 values compare
    identically to their exact float32 images)."""
    import jax.numpy as jnp
    return (jnp.int32 if np.issubdtype(np.dtype(wire_dtype), np.integer)
            else jnp.float32)


# executables memoized per shape signature: the within-task speaker
# loop, by-group passes, and repeated same-inventory calls (raw vs
# trained embeddings) all reuse one compile
_KERNEL_CACHE: Dict[Tuple, object] = {}


def _chunk_kernel(Crows: int, Ccols: int, max_b: int, max_x: int,
                  P: int, A: int, wire_dtype):
    """One jitted dispatch: score chunk ``i`` — a (P, A) grid of pool
    slots read from device-staged chunk tables with a device-resident
    counter — against each slot's B sets and its pool's class-sorted X
    table, accumulating greater/equal counts into donated
    (Crows+1, Ccols) float32 bins (row Crows is the dump row for padded
    anchors). Rows are composite (by-group, class) ids; columns are
    group-local class ids. Every argument is device-resident, so the
    call enqueues without a single h2d RPC (module docstring)."""
    import jax
    import jax.numpy as jnp

    key = (Crows, Ccols, max_b, max_x, P, A,
           np.dtype(wire_dtype).str, jax.default_backend())
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    cdt = _compare_dtype(wire_dtype)

    def step(Dq, cls_tab, b_ids_tab, b_cnt_tab, x_ids_tab, x_seg_tab,
             x_cnt_tab, sel_tab, valid_tab, pool_tab, state):
        gt_bins, eq_bins, i = state
        a_ids = sel_tab[i]                              # (P, A)
        a_valid = valid_tab[i]                          # (P, A) bool
        pools = pool_tab[i]                             # (P,)
        x_ids = x_ids_tab[pools]                        # (P, max_x)
        x_seg = x_seg_tab[pools]
        x_cnt = x_cnt_tab[pools]                        # (P,)
        flat = a_ids.reshape(-1)                        # (P*A,)
        # one row gather per anchor, then column gathers out of the rows
        rows = Dq[flat].astype(cdt).reshape(P, A, -1)   # (P, A, Np)
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

    donate = () if jax.default_backend() == "cpu" else (10,)
    fn = jax.jit(step, donate_argnums=donate)
    _KERNEL_CACHE[key] = fn
    return fn


def _sub_gather(R: int, Cc: int):
    """Jitted ``(gt_bins, eq_bins, ridx(R,), cidx(Cc,)) ->
    ((R, Cc) x 2)`` occupied-submatrix gather, memoized per shape so
    every speaker pass of a within-task run reuses ONE executable
    (fresh shapes would each pay a remote compile through the dev
    tunnel, CLAUDE.md). Row padding indexes the dump row; column
    padding uses the sentinel ``Ccols``, which jax's clamping gather
    maps to the last column — both discarded host-side."""
    import jax

    key = ("subgather", R, Cc, jax.default_backend())
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda gt, eq, ridx, cidx: (gt[ridx][:, cidx],
                                                 eq[ridx][:, cidx]))
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
    S = int(spk.max()) + 1 if N else 0
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
    del S
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
    ``distance_matrix(device_out=True)`` (no upload at all). ``by``
    conditioning runs in the same single pass over the full matrix —
    composite bin rows keep each group's cells separate."""
    import jax
    import jax.numpy as jnp

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

    x_ids, x_seg, x_cnt, pool_spk, pool_of, max_x = _pool_tables(
        cls, spk, gid, row_off, Ccols)
    b_ids, b_cnt, max_b = _anchor_b_tables(cls, spk, Crows, task)
    n_pools = len(x_cnt)

    # slot geometry: A anchors per pool slot, P slots per dispatch.
    # Large pools (unconditioned inventories) get A = chunk, P = 1 —
    # the round-4 hardware-validated shape; tiny by-group pools pack
    # many slots per dispatch instead of padding each to `chunk`.
    A = min(chunk, pow2_bucket(int(x_cnt.max()), minimum=8))
    P = max(1, chunk // A)

    wire = np.dtype(dm.array.dtype)
    kernel = _chunk_kernel(Crows, Ccols, max_b, max_x, P, A, wire)

    # static tables: one h2d each for the whole scoring run
    statics = tuple(jax.device_put(a) for a in (
        cls, b_ids, b_cnt, x_ids, x_seg, x_cnt.astype(np.int32)))
    by_pool = [np.flatnonzero(pool_of == p) for p in range(n_pools)]

    def run_bins(pool_list, occ_rows=None,
                 occ_cols=None) -> Tuple[np.ndarray, np.ndarray]:
        """Score the anchors of the given pools into fresh bins;
        returns host float64 (Crows, Ccols) greater/equal counts.
        ``occ_rows`` / ``occ_cols`` (sorted int32 anchor rows / local
        class columns with any triplets, padded to shared bucket
        lengths with the ``Crows`` / ``Ccols`` sentinels) compact the
        d2h fetch to the occupied submatrix (module docstring)."""
        sels: List[np.ndarray] = []
        valids: List[np.ndarray] = []
        pool_ids: List[int] = []
        for p in pool_list:
            anchors = by_pool[p]
            for c0 in range(0, len(anchors), A):
                sel = anchors[c0:c0 + A].astype(np.int32)
                a_valid = np.ones(A, bool)
                pad = A - len(sel)
                if pad:
                    a_valid[len(sel):] = False
                    sel = np.concatenate([sel, np.zeros(pad, np.int32)])
                sels.append(sel)
                valids.append(a_valid)
                pool_ids.append(p)
        if not sels:
            z = np.zeros((Crows, Ccols), np.float64)
            return z, z.copy()
        # pad the slot list to whole (P,) chunks with all-invalid slots
        while len(sels) % P:
            sels.append(np.zeros(A, np.int32))
            valids.append(np.zeros(A, bool))
            pool_ids.append(0)
        n_chunks = len(sels) // P
        # per-chunk tables: staged in ONE h2d each; the kernel indexes
        # them with the device-resident counter chained through state
        chunk_tabs = (
            jax.device_put(np.stack(sels).reshape(n_chunks, P, A)),
            jax.device_put(np.stack(valids).reshape(n_chunks, P, A)),
            jax.device_put(
                np.asarray(pool_ids, np.int32).reshape(n_chunks, P)))
        state = (jnp.zeros((Crows + 1, Ccols), jnp.float32),
                 jnp.zeros((Crows + 1, Ccols), jnp.float32),
                 jnp.zeros((), jnp.int32))
        for _ in range(n_chunks):
            state = kernel(dm.array, *statics, *chunk_tabs, state)
        gt_bins, eq_bins, _ = state
        if occ_rows is not None or occ_cols is not None:
            rs = (occ_rows if occ_rows is not None
                  else np.arange(Crows, dtype=np.int32))
            cs = (occ_cols if occ_cols is not None
                  else np.arange(Ccols, dtype=np.int32))
            sub = _sub_gather(len(rs), len(cs))(
                gt_bins, eq_bins, jax.device_put(rs),
                jax.device_put(cs))
            mr, mc = rs < Crows, cs < Ccols   # drop sentinel padding
            grid = np.ix_(rs[mr], cs[mc])
            gt = np.zeros((Crows, Ccols), np.float32)
            eq = np.zeros((Crows, Ccols), np.float32)
            gt[grid] = _fetch_rows(sub[0], len(rs), len(cs))[mr][:, mc]
            eq[grid] = _fetch_rows(sub[1], len(rs), len(cs))[mr][:, mc]
        else:
            gt = _fetch_rows(gt_bins, Crows + 1, Ccols)[:Crows]
            eq = _fetch_rows(eq_bins, Crows + 1, Ccols)[:Crows]
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
        occ = np.concatenate(
            [np.flatnonzero((cnts[g] > 0).any(axis=1)) + row_off[g]
             for g in range(G)])
        occ_c = occ_cols_of(cnts)
        R = pow2_bucket(len(occ), minimum=8)
        Rc = pow2_bucket(len(occ_c), minimum=8)
        if not _compact_enabled():
            R, Rc = Crows, Ccols
        gt, eq = run_bins(
            range(n_pools),
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

    # within: cells are (ca, cx, s) — one speaker at a time so the
    # (Crows, Ccols) bins are that speaker's cells
    per_group: List[List[Tuple[Tuple, float, int]]] = [[] for _ in
                                                       range(G)]
    trip_group = [0] * G
    occ_by_s = [np.concatenate(
        [np.flatnonzero((cnts[g][:, :, s] > 0).any(axis=1)) + row_off[g]
         for g in range(G)]) for s in range(S)]
    occ_c_by_s = [occ_cols_of([cnts[g][:, :, s] for g in range(G)])
                  for s in range(S)]
    Rb = pow2_bucket(max((len(r) for r in occ_by_s), default=1),
                     minimum=8)
    Rc = pow2_bucket(max((len(c) for c in occ_c_by_s), default=1),
                     minimum=8)
    compact, compact_c = Rb < Crows, Rc < Ccols
    if not _compact_enabled():
        compact = compact_c = False
    for s in range(S):
        pools_s = [p for p in range(n_pools) if pool_spk[p] == s]
        if not any((cnts[gid[by_pool[p][0]]][:, :, s] > 0).any()
                   for p in pools_s if len(by_pool[p])):
            continue
        gt, eq = run_bins(
            pools_s,
            pad_occ(occ_by_s[s], Rb, Crows) if compact else None,
            pad_occ(occ_c_by_s[s], Rc, Ccols) if compact_c else None)
        err = gt + 0.5 * eq
        for p in pools_s:
            if not len(by_pool[p]):
                continue
            g = int(gid[by_pool[p][0]])
            lo, hi = int(row_off[g]), int(row_off[g + 1])
            Cg = hi - lo
            cnt_s = cnts[g][:, :, s]
            if not (cnt_s > 0).any():
                continue
            cls_names = group_classes[g]
            trip_group[g] += int(cnt_s.sum())
            blk = err[lo:hi, :Cg]
            for ca, cx in zip(*np.nonzero(cnt_s > 0)):
                per_group[g].append(
                    ((cls_names[ca], cls_names[cx], spks[s]),
                     blk[ca, cx] / cnt_s[ca, cx],
                     int(cnt_s[ca, cx])))
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
