"""TPU-native ABX discriminability evaluation.

The reference computes no ABX itself: embeddings are exported to
h5features and scored externally by ABXpy (reference README.md:3;
reference embedder.py:98-100). Here the evaluation is part of the
framework, with the O(N^2) token-distance stage on the TPU: tokens live
in an HBM-resident TokenBank, normalized DTW distances for id batches
are computed in one jitted computation each (MXU cosine-distance matrix
+ the same batched DP/backtrace used for training alignment), and only
the (N, N) distance matrix returns to the host for triplet aggregation.

Distances
---------
- ``dtw_cos`` (default): mean angular cosine frame distance along the
  optimal DTW path — ABXpy's standard dtw_cosine token distance.
- ``mean_cos``: angular cosine distance of masked mean-pooled tokens
  (one MXU matmul for the whole matrix; no DTW).

Score
-----
ABX asks how often a token A of class c_A sits closer to a same-class
token B than to an other-class token X: error = mean of
``1[d(A,B) > d(A,X)] + 0.5 * 1[d(A,B) == d(A,X)]``.

- ``task='across'``: B shares A's class but NOT its speaker; X shares
  A's speaker but not its class — speaker-invariance stress test; cells
  are (class_A, class_X) pairs.
- ``task='within'``: A, B, X all from one speaker; cells are
  (class_A, class_X, speaker).

Triplet errors average hierarchically: triplets -> cell -> mean over
non-empty cells (ABXpy's collapse order), so large classes don't
dominate the score.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["make_pair_distance_fn", "distance_matrix", "abx_error",
           "evaluate", "main"]


def make_pair_distance_fn(bank, distance: str = "dtw_cos",
                          max_frames: Optional[int] = None, mesh=None):
    """Jitted (ids1, ids2) -> (B,) normalized token distances over a
    TokenBank. One compiled computation per bank/bucket."""
    import jax
    import jax.numpy as jnp
    from abnet3_tpu.ops.dtw import (dtw_path_from_dist,
                                    pairwise_angular_distance)

    assert distance in ("dtw_cos", "mean_cos")
    T = max_frames if max_frames is not None else bank.max_len

    def impl(ids1, ids2):
        f1, n1 = bank.take(ids1, T)
        f2, n2 = bank.take(ids2, T)
        if distance == "mean_cos":
            m1 = (jnp.arange(T)[None, :] < n1[:, None])[..., None]
            m2 = (jnp.arange(T)[None, :] < n2[:, None])[..., None]
            v1 = jnp.sum(f1 * m1, 1) / jnp.maximum(n1[:, None], 1)
            v2 = jnp.sum(f2 * m2, 1) / jnp.maximum(n2[:, None], 1)
            return pairwise_angular_distance(
                v1[:, None, :], v2[:, None, :])[:, 0, 0]
        dist = pairwise_angular_distance(f1, f2)
        # mean distance along the optimal path = sum(dist * A) / sum(A)
        # with A the on-path mask — no backtrace walk, no gathers (the
        # same matrix-alignment contract the train steps use)
        A = dtw_path_from_dist(dist, n1, n2, mesh=mesh)
        plen = jnp.sum(A, axis=(1, 2))
        return (jnp.sum(dist * A, axis=(1, 2))
                / jnp.maximum(plen, 1.0))

    return jax.jit(impl)


def distance_matrix(bank, distance: str = "dtw_cos",
                    batch_size: int = 1024, mesh=None,
                    max_frames: Optional[int] = None) -> np.ndarray:
    """All-pairs normalized token distances: (N, N) float32, zero
    diagonal, symmetric. N(N+1)/2 pairs stream through the jitted pair
    kernel in fixed-size id batches (tail padded; padded results
    discarded)."""
    import jax

    N = len(bank)
    fn = make_pair_distance_fn(bank, distance=distance,
                               max_frames=max_frames, mesh=mesh)
    iu = np.triu_indices(N, k=1)
    ids1_all = iu[0].astype(np.int32)
    ids2_all = iu[1].astype(np.int32)
    D = np.zeros((N, N), np.float32)
    total = len(ids1_all)
    # pipeline the dispatches: enqueue all batches, then drain
    pending: List[Tuple[int, int, object]] = []
    window = 8
    for c0 in range(0, total, batch_size):
        i1 = ids1_all[c0:c0 + batch_size]
        i2 = ids2_all[c0:c0 + batch_size]
        n_valid = len(i1)
        if n_valid < batch_size:  # static shape: pad with pair (0, 0)
            pad = batch_size - n_valid
            i1 = np.concatenate([i1, np.zeros(pad, np.int32)])
            i2 = np.concatenate([i2, np.zeros(pad, np.int32)])
        out = fn(jax.device_put(i1), jax.device_put(i2))
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        pending.append((c0, n_valid, out))
        if len(pending) >= window:
            c, nv, o = pending.pop(0)
            vals = np.asarray(o)[:nv]
            D[ids1_all[c:c + nv], ids2_all[c:c + nv]] = vals
    while pending:
        c, nv, o = pending.pop(0)
        vals = np.asarray(o)[:nv]
        D[ids1_all[c:c + nv], ids2_all[c:c + nv]] = vals
    D = D + D.T
    return D


def abx_error(D: np.ndarray, labels: Sequence, speakers: Sequence,
              task: str = "across") -> Dict:
    """Hierarchical ABX error from a precomputed distance matrix.

    Returns {"error", "n_cells", "n_triplets"}; error is the mean over
    non-empty cells of the per-cell triplet error (ties count 0.5)."""
    assert task in ("across", "within")
    labels = np.asarray(labels)
    speakers = np.asarray(speakers)
    N = len(labels)
    assert D.shape == (N, N) and len(speakers) == N
    classes = sorted(set(labels.tolist()))
    cell_scores: List[float] = []
    n_triplets = 0

    def cell(a_idx, sel_fn):
        """One cell: mean error over {(a, b, x)} with b, x vectorized
        per a; sel_fn(a) -> (b_indices, x_indices), a excluded. Ties
        count 0.5 (ABXpy semantics)."""
        nonlocal n_triplets
        err, cnt = 0.0, 0
        for a in a_idx:
            b_sel, x_sel = sel_fn(a)
            if len(b_sel) == 0 or len(x_sel) == 0:
                continue
            dab = D[a, b_sel][:, None]   # (B, 1)
            dax = D[a, x_sel][None, :]   # (1, X)
            err += float(np.sum(dab > dax) + 0.5 * np.sum(dab == dax))
            cnt += len(b_sel) * len(x_sel)
        if cnt:
            n_triplets += cnt
            cell_scores.append(err / cnt)

    for ca in classes:
        for cx in classes:
            if ca == cx:
                continue
            if task == "across":
                # one cell per (ca, cx): A any token of ca; B same class
                # but NOT A's speaker; X class cx with A's speaker
                cell(np.flatnonzero(labels == ca),
                     lambda a: (
                         np.flatnonzero((labels == ca)
                                        & (speakers != speakers[a])),
                         np.flatnonzero((labels == cx)
                                        & (speakers == speakers[a]))))
            else:
                for spk in sorted(set(speakers.tolist())):
                    sel = speakers == spk
                    ab = np.flatnonzero((labels == ca) & sel)
                    x = np.flatnonzero((labels == cx) & sel)
                    cell(ab, lambda a: (ab[ab != a], x[x != a]))

    return {"error": (float(np.mean(cell_scores))
                      if cell_scores else float("nan")),
            "n_cells": len(cell_scores),
            "n_triplets": int(n_triplets)}


def evaluate(features_path: str, classes_path: str,
             spkid_file: Optional[str] = None, task: str = "across",
             distance: str = "dtw_cos", batch_size: int = 1024,
             max_frames: Optional[int] = None, mesh=None) -> Dict:
    """End-to-end ABX over an h5features file + .classes token inventory
    (+ wav->speaker mapping, same file contracts as the sampler)."""
    from abnet3_tpu.ops.bank import TokenBank
    from abnet3_tpu.sampler import SamplerClusterSiamese
    from abnet3_tpu.utils import read_feats, read_spkid_file

    clusters = SamplerClusterSiamese().parse_input_file(classes_path)
    spkid = read_spkid_file(spkid_file) if spkid_file else None
    accessor, _, _ = read_feats(features_path)
    token_feats, labels, speakers = {}, [], []
    tid = 0
    for ci, cluster in enumerate(clusters):
        for f, on, off in cluster:
            feat = accessor.get(f, on, off)
            if len(feat) == 0:
                continue
            token_feats[tid] = np.asarray(feat, np.float32)
            labels.append(ci)
            speakers.append(spkid[f] if spkid else f)
            tid += 1
    bank = TokenBank(token_feats, max_frames=max_frames)
    D = distance_matrix(bank, distance=distance, batch_size=batch_size,
                        mesh=mesh, max_frames=max_frames)
    out = abx_error(D, labels, speakers, task=task)
    out.update({"task": task, "distance": distance, "n_tokens": tid,
                "n_classes": len(clusters)})
    return out


def main():
    parser = argparse.ArgumentParser(
        description="TPU-native ABX discriminability evaluation")
    parser.add_argument("features", help="h5features file to score")
    parser.add_argument("classes", help=".classes token inventory")
    parser.add_argument("-s", "--spkid-file",
                        help="wav->speaker mapping (one 'file spk' per "
                             "line); defaults to per-file speakers")
    parser.add_argument("-t", "--task", default="across",
                        choices=["across", "within"])
    parser.add_argument("-d", "--distance", default="dtw_cos",
                        choices=["dtw_cos", "mean_cos"])
    parser.add_argument("-b", "--batch-size", type=int, default=1024)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("-o", "--output", help="write the result JSON "
                                               "here as well as stdout")
    args = parser.parse_args()
    result = evaluate(args.features, args.classes,
                      spkid_file=args.spkid_file, task=args.task,
                      distance=args.distance, batch_size=args.batch_size,
                      max_frames=args.max_frames)
    line = json.dumps(result)
    print(line)
    if args.output:
        with open(args.output, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
