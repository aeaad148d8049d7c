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

- Within one (class_A=ca, speaker=s) anchor group, every anchor shares
  the same B set (across: ca tokens of OTHER speakers; within: the
  other ca tokens of s) and draws X from the same candidate pool (the
  tokens of s). So anchors process in per-speaker chunks: one row
  gather of D per anchor gives d(a, B) (chunk, max_b) and d(a, X)
  (chunk, max_x), and a masked comparison cube reduced over B yields
  per-(anchor, x) greater/equal counts — integer VPU work.
- Cell attribution avoids a flat scatter into |C|^2 bins (TPU scatters
  serialize): each speaker's X candidate table is pre-sorted by class,
  so one segment-sum over the X axis collapses (chunk, max_x) counts
  to per-class columns, and one scatter-add of ``chunk`` rows lands
  them in the (C, C) cell bins.
- Greater/equal counts accumulate in separate float32 bins (exact for
  integers < 2^24; guarded against larger cells) that stay on device
  across dispatches via buffer donation; the 0.5 tie weight, per-cell
  division, and mean over cells run on the host in float64 — the host
  scorer's exact arithmetic.
- The kernel is scan-free on purpose: scan-bearing executables compile
  143-383 s on this environment's remote compile service, a flat chunk
  kernel compiles like the small pair executable and the Python chunk
  loop costs one ~50 ms dispatch per ``chunk`` anchors.
- The chunk loop is zero-h2d: every per-chunk table (anchor ids, valid
  masks, chunk->speaker map) is staged onto the device ONCE and the
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
- per-cell greater/equal counts are exact integers, and the final
  reduction happens host-side in float64 with the cells ordered by
  sorted cell key — the host scorer's accumulation order and dtype.

The matrix never leaves the chip: ``distance_matrix(device_out=True)``
assembles the uint16 tile results into an HBM-resident (Np, Np) matrix
as tiles drain (mirroring diagonal tiles exactly as the host drain
does) and the scorer gathers straight from it. A host matrix
(checkpoint resume, the pairs strategy, external arrays) uploads once
in row chunks.

Scale note: the ``within`` task bins per (ca, cx, SPEAKER) cell, so it
fetches one (C, C) bin pair per speaker — fine at word-inventory class
counts; at |C| in the thousands with many speakers prefer the host
scorer's ``n_jobs`` pool for within (the across task, the ZeroSpeech
headline, fetches one bin pair total).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["DeviceMatrix", "upload_matrix", "abx_error_device",
           "device_scorable"]

# anchors per dispatch: 256 keeps the (chunk, max_b, max_x) comparison
# cube tens of MB at ZeroSpeech shapes (max_b ~ 64, max_x ~ 1500 ->
# 25M entries) while each ~50 ms dispatch scores chunk * max_x columns
_CHUNK = 256

# float32 bins hold exact integer counts only below 2^24; a single cell
# accumulating more triplets than this would round. Real cells are
# orders of magnitude smaller (the N=30k synthetic inventory averages
# 43 triplets/cell) — the guard refuses loudly instead of rounding.
_F32_EXACT = 1 << 24


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


def _make_chunk_kernel(C: int, max_b: int, max_x: int, Ca: int,
                       wire_dtype):
    """One jitted dispatch: score chunk ``i`` (``Ca`` anchors, all one
    speaker — read from device-staged chunk tables with a device-
    resident counter) against its B sets and the speaker's class-sorted
    X table, accumulating greater/equal counts into donated (C+1, C)
    float32 bins (row C is the dump row for padded anchors). Every
    argument is device-resident, so the call enqueues without a single
    h2d RPC (module docstring)."""
    import jax
    import jax.numpy as jnp

    cdt = _compare_dtype(wire_dtype)

    def step(Dq, cls_tab, b_ids_tab, b_cnt_tab, x_ids_tab, x_seg_tab,
             x_cnt_tab, sel_tab, valid_tab, spk_tab, state):
        gt_bins, eq_bins, i = state
        a_ids = sel_tab[i]                              # (Ca,)
        a_valid = valid_tab[i]                          # (Ca,) bool
        s = spk_tab[i]
        x_ids = x_ids_tab[s]                            # (max_x,)
        x_seg = x_seg_tab[s]
        x_cnt = x_cnt_tab[s]
        # one row gather per anchor, then column gathers out of the rows
        rows = Dq[a_ids].astype(cdt)                    # (Ca, Np)
        b_ids = b_ids_tab[a_ids]                        # (Ca, max_b)
        dab = jnp.take_along_axis(rows, b_ids, axis=1)
        dax = jnp.take_along_axis(
            rows, jnp.broadcast_to(x_ids[None, :], (Ca, max_x)), axis=1)
        vb = jnp.arange(max_b)[None, :] < b_cnt_tab[a_ids][:, None]
        # padded X slots are masked here; the anchor's own class lands
        # in the (ca, ca) diagonal bin, which is never read
        vx = (jnp.arange(max_x)[None, :] < x_cnt) & a_valid[:, None]
        gt = jnp.sum((dab[:, :, None] > dax[:, None, :])
                     & vb[:, :, None], axis=1)          # (Ca, max_x)
        eq = jnp.sum((dab[:, :, None] == dax[:, None, :])
                     & vb[:, :, None], axis=1)
        gt = jnp.where(vx, gt, 0).astype(jnp.float32)
        eq = jnp.where(vx, eq, 0).astype(jnp.float32)
        # stage 1: collapse the class-sorted X axis to per-class
        # columns (segment ids shared by every anchor of this speaker)
        gt_c = jax.ops.segment_sum(gt.T, x_seg, num_segments=C + 1)
        eq_c = jax.ops.segment_sum(eq.T, x_seg, num_segments=C + 1)
        # stage 2: scatter-add Ca rows into the (C+1, C) cell bins
        row = jnp.where(a_valid, cls_tab[a_ids], C)
        gt_bins = gt_bins.at[row].add(gt_c[:C].T)
        eq_bins = eq_bins.at[row].add(eq_c[:C].T)
        return gt_bins, eq_bins, i + 1

    donate = () if jax.default_backend() == "cpu" else (10,)
    return jax.jit(step, donate_argnums=donate)


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


def _speaker_tables(cls: np.ndarray, spk: np.ndarray, C: int, S: int):
    """Per-speaker class-sorted X candidate tables: x_ids (S, max_x)
    token ids (pad 0), x_seg (S, max_x) class segment ids (pad C),
    x_cnt (S,)."""
    order = np.lexsort((cls, spk))  # by speaker, then class
    counts = np.bincount(spk, minlength=S)
    max_x = max(int(counts.max()) if len(counts) else 1, 1)
    x_ids = np.zeros((S, max_x), np.int32)
    x_seg = np.full((S, max_x), C, np.int32)
    pos = 0
    for s in range(S):
        n = int(counts[s])
        sel = order[pos:pos + n]
        x_ids[s, :n] = sel
        x_seg[s, :n] = cls[sel]
        pos += n
    return x_ids, x_seg, counts.astype(np.int32), max_x


def _anchor_b_tables(cls: np.ndarray, spk: np.ndarray, C: int,
                     task: str):
    """Per-anchor B-set tables: b_ids (N, max_b) int32 (pad 0) and
    b_cnt (N,). Across: same class, other speakers. Within: same
    class, same speaker, anchor excluded."""
    N = len(cls)
    b_lists: List[Optional[np.ndarray]] = [None] * N
    max_b = 1
    for c in range(C):
        idx = np.flatnonzero(cls == c)
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
    """Analytic per-cell triplet counts from the (C, S) class-speaker
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
                    task: str = "across") -> bool:
    """True when the device scorer can count this inventory exactly
    (every cell below 2^24 triplets — the float32-bin exactness bound).
    Cheap (histogram math only): callers that want to skip the host
    matrix entirely check this BEFORE the distance stage, so no
    fallback ever needs a matrix that was never fetched."""
    labels = np.asarray(labels)
    speakers = np.asarray(speakers)
    _, cls = _dense_ids(labels)
    _, spk = _dense_ids(speakers)
    C, S = int(cls.max()) + 1 if len(cls) else 0, \
        int(spk.max()) + 1 if len(spk) else 0
    if not C:
        return True
    n_cs = np.zeros((C, S), np.int64)
    np.add.at(n_cs, (cls, spk), 1)
    cnt = _cell_counts(n_cs, task)
    return not cnt.size or float(cnt.max()) < _F32_EXACT


def abx_error_device(D, labels: Sequence, speakers: Sequence,
                     task: str = "across",
                     by: Optional[Sequence] = None,
                     chunk: int = _CHUNK) -> Dict:
    """Device-backed twin of :func:`abnet3_tpu.eval.abx.abx_error` —
    same inputs plus :class:`DeviceMatrix` handles for ``D``, same
    result dict, bit-identical ``error`` (module docstring).

    ``D``: a host (N, N) matrix (uploaded once, compared in its own
    dtype) or a :class:`DeviceMatrix` from
    ``distance_matrix(device_out=True)`` (no upload at all)."""
    import jax
    import jax.numpy as jnp

    assert task in ("across", "within")
    labels = np.asarray(labels)
    speakers = np.asarray(speakers)
    N = len(labels)
    if by is not None:
        # ABXpy BY-conditioning = the unconditioned enumeration inside
        # each group (host-path semantics). Groups re-slice the matrix,
        # so the host ndarray is required here.
        if isinstance(D, DeviceMatrix):
            raise ValueError("by-conditioning re-slices the matrix per "
                             "group; pass the host ndarray")
        assert len(by) == N
        groups: Dict = {}
        for i, b in enumerate(by):
            groups.setdefault(b, []).append(i)
        err_sum, n_cells, n_trip = 0.0, 0, 0
        for key in sorted(groups):
            idx = np.asarray(groups[key], dtype=np.int64)
            sub = abx_error_device(D[np.ix_(idx, idx)], labels[idx],
                                   speakers[idx], task=task, chunk=chunk)
            if sub["n_cells"]:
                err_sum += sub["error"] * sub["n_cells"]
                n_cells += sub["n_cells"]
                n_trip += sub["n_triplets"]
        return {"error": (err_sum / n_cells if n_cells
                          else float("nan")),
                "n_cells": n_cells, "n_triplets": n_trip}

    if isinstance(D, DeviceMatrix):
        assert D.n == N, (D.n, N)
        dm = D
    else:
        assert D.shape == (N, N)
        dm = None  # upload lazily, only if there are cells to score
    assert len(speakers) == N

    classes, cls = _dense_ids(labels)
    spks, spk = _dense_ids(speakers)
    C, S = len(classes), len(spks)
    n_cs = np.zeros((C, S), np.int64)
    np.add.at(n_cs, (cls, spk), 1)

    cnt = _cell_counts(n_cs, task)
    if not (cnt > 0).any():
        return {"error": float("nan"), "n_cells": 0, "n_triplets": 0}
    if float(cnt.max()) >= _F32_EXACT:
        raise ValueError(
            "a single ABX cell carries >= 2^24 triplets — float32 "
            "device bins would round its counts; score this inventory "
            "with the host path (abx.abx_error)")
    if dm is None:
        dm = upload_matrix(D)

    x_ids, x_seg, x_cnt, max_x = _speaker_tables(cls, spk, C, S)
    b_ids, b_cnt, max_b = _anchor_b_tables(cls, spk, C, task)

    wire = np.dtype(dm.array.dtype)
    kernel = _make_chunk_kernel(C, max_b, max_x, chunk, wire)

    # static tables: one h2d each for the whole scoring run
    statics = tuple(jax.device_put(a) for a in (
        cls, b_ids, b_cnt, x_ids, x_seg, x_cnt.astype(np.int32)))
    by_speaker = [np.flatnonzero(spk == s) for s in range(S)]

    def run_bins(speaker_list) -> Tuple[np.ndarray, np.ndarray]:
        """Score the anchors of the given speakers into fresh bins;
        returns host float64 (C, C) greater/equal count matrices."""
        sels: List[np.ndarray] = []
        valids: List[np.ndarray] = []
        spks: List[int] = []
        for s in speaker_list:
            anchors = by_speaker[s]
            for c0 in range(0, len(anchors), chunk):
                sel = anchors[c0:c0 + chunk].astype(np.int32)
                a_valid = np.ones(chunk, bool)
                pad = chunk - len(sel)
                if pad:
                    a_valid[len(sel):] = False
                    sel = np.concatenate([sel, np.zeros(pad, np.int32)])
                sels.append(sel)
                valids.append(a_valid)
                spks.append(s)
        if not sels:
            z = np.zeros((C, C), np.float64)
            return z, z.copy()
        # per-chunk tables: staged in ONE h2d each; the kernel indexes
        # them with the device-resident counter chained through state
        chunk_tabs = (jax.device_put(np.stack(sels)),
                      jax.device_put(np.stack(valids)),
                      jax.device_put(np.asarray(spks, np.int32)))
        state = (jnp.zeros((C + 1, C), jnp.float32),
                 jnp.zeros((C + 1, C), jnp.float32),
                 jnp.zeros((), jnp.int32))
        for _ in range(len(sels)):
            state = kernel(dm.array, *statics, *chunk_tabs, state)
        gt_bins, eq_bins, _ = state
        gt = _fetch_rows(gt_bins, C + 1, C)[:C].astype(np.float64)
        eq = _fetch_rows(eq_bins, C + 1, C)[:C].astype(np.float64)
        return gt, eq

    if task == "across":
        gt, eq = run_bins(range(S))
        err = gt + 0.5 * eq
        occupied = cnt > 0
        # boolean indexing is row-major over dense ids = sorted
        # (ca, cx) keys — the host scorer's cell order
        scores = err[occupied] / cnt[occupied]
        return {"error": (float(np.mean(scores)) if scores.size
                          else float("nan")),
                "n_cells": int(occupied.sum()),
                "n_triplets": int(cnt.sum())}

    # within: cells are (ca, cx, s) — one speaker at a time so the
    # (C, C) bins are that speaker's cells
    cell_list: List[Tuple[Tuple, float]] = []
    n_trip = 0
    for s in range(S):
        cnt_s = cnt[:, :, s]
        if not (cnt_s > 0).any():
            continue
        gt, eq = run_bins([s])
        err = gt + 0.5 * eq
        n_trip += int(cnt_s.sum())
        for ca, cx in zip(*np.nonzero(cnt_s > 0)):
            cell_list.append(((classes[ca], classes[cx], spks[s]),
                              err[ca, cx] / cnt_s[ca, cx]))
    cell_list.sort(key=lambda kv: kv[0])
    scores = np.asarray([v for _, v in cell_list], np.float64)
    return {"error": (float(np.mean(scores)) if len(cell_list)
                      else float("nan")),
            "n_cells": len(cell_list), "n_triplets": n_trip}
