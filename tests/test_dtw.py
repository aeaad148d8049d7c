"""Device DTW kernel vs the numpy host oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from abnet3_tpu import utils
from abnet3_tpu.ops import (align_diff_batch, dtw_align_batch, dtw_costs,
                            gather_aligned, pairwise_angular_distance)


def _pad_batch(seqs, T, d):
    B = len(seqs)
    out = np.zeros((B, T, d), np.float32)
    lens = np.zeros((B,), np.int32)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s
        lens[i] = len(s)
    return out, lens


def test_pairwise_angular_distance_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 12, 8).astype(np.float32)
    y = rng.randn(3, 17, 8).astype(np.float32)
    got = np.asarray(pairwise_angular_distance(jnp.asarray(x),
                                               jnp.asarray(y)))
    for b in range(3):
        expected = utils.cosine_distance(x[b], y[b])
        np.testing.assert_allclose(got[b], expected, atol=2e-3)


def test_pairwise_distance_zero_norm_frames():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 4).astype(np.float32)
    y = rng.randn(1, 6, 4).astype(np.float32)
    x[0, 2] = 0.0
    y[0, 3] = 0.0
    d = np.asarray(pairwise_angular_distance(jnp.asarray(x), jnp.asarray(y)))
    assert np.all(d[0, 2, [0, 1, 2, 4, 5]] == 1.0)
    assert np.all(d[0, [0, 1, 3, 4], 3] == 1.0)
    assert d[0, 2, 3] == 0.0


def test_dtw_costs_match_oracle():
    rng = np.random.RandomState(2)
    dist = rng.rand(2, 10, 13).astype(np.float32)
    D = np.asarray(dtw_costs(jnp.asarray(dist)))
    for b in range(2):
        # oracle DP
        T1, T2 = 10, 13
        E = np.zeros((T1, T2))
        E[0] = np.cumsum(dist[b, 0])
        for i in range(1, T1):
            E[i, 0] = E[i - 1, 0] + dist[b, i, 0]
            for j in range(1, T2):
                E[i, j] = dist[b, i, j] + min(E[i - 1, j], E[i, j - 1],
                                              E[i - 1, j - 1])
        np.testing.assert_allclose(D[b], E, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_dtw_align_batch_optimal_and_valid(seed):
    """Device paths must be valid warping paths achieving the optimal cost
    (the host oracle's cost), even with ragged lengths + padding."""
    rng = np.random.RandomState(seed)
    d = 6
    lens1 = [5, 12, 20, 1, 9]
    lens2 = [7, 12, 3, 8, 9]
    seqs1 = [rng.randn(n, d).astype(np.float32) for n in lens1]
    seqs2 = [rng.randn(n, d).astype(np.float32) for n in lens2]
    T1, T2 = 20, 16
    f1, n1 = _pad_batch(seqs1, T1, d)
    f2, n2 = _pad_batch(seqs2, T2, d)

    p1, p2, plen = dtw_align_batch(jnp.asarray(f1), jnp.asarray(f2),
                                   jnp.asarray(n1), jnp.asarray(n2))
    p1, p2, plen = map(np.asarray, (p1, p2, plen))

    for b in range(len(lens1)):
        L = int(plen[b])
        q1, q2 = p1[b, :L], p2[b, :L]
        # boundary + monotonicity
        assert q1[0] == 0 and q2[0] == 0
        assert q1[-1] == lens1[b] - 1 and q2[-1] == lens2[b] - 1
        steps = np.stack([np.diff(q1), np.diff(q2)], 1)
        assert np.all(steps >= 0) and np.all(steps.max(1) == 1)
        # optimality: path cost == oracle optimal cost
        dist = utils.cosine_distance(seqs1[b], seqs2[b])
        oracle_cost, o1, o2 = utils.dtw_numpy(dist)
        got_cost = dist[q1, q2].sum()
        assert got_cost == pytest.approx(oracle_cost, abs=1e-3)
        # oracle and device agree on path length for these seeds
        assert L == len(o1)


def test_dtw_align_same_sequence_is_diagonal():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 10, 4).astype(np.float32)
    p1, p2, plen = dtw_align_batch(jnp.asarray(x), jnp.asarray(x),
                                   jnp.asarray([10]), jnp.asarray([10]))
    assert int(plen[0]) == 10
    np.testing.assert_array_equal(np.asarray(p1)[0, :10], np.arange(10))
    np.testing.assert_array_equal(np.asarray(p2)[0, :10], np.arange(10))


def test_align_diff_truncate():
    n1 = jnp.asarray([5, 9])
    n2 = jnp.asarray([7, 4])
    p1, p2, plen = align_diff_batch(n1, n2, 10, 10,
                                    align_different_words=False)
    p1, p2, plen = map(np.asarray, (p1, p2, plen))
    assert plen.tolist() == [5, 4]
    np.testing.assert_array_equal(p1[0, :5], np.arange(5))
    np.testing.assert_array_equal(p2[0, :5], np.arange(5))


def test_align_diff_diagonal_matches_reference_mapping():
    """Diagonal alignment == rint(linspace) mapping
    (reference dataloader.py:217-225)."""
    n1v, n2v = 4, 9
    p1, p2, plen = align_diff_batch(jnp.asarray([n1v]), jnp.asarray([n2v]),
                                    12, 12, align_different_words=True)
    p1, p2, plen = map(np.asarray, (p1, p2, plen))
    L = int(plen[0])
    assert L == 9
    mapping = np.rint(np.linspace(0, n1v - 1, num=n2v)).astype(int)
    np.testing.assert_array_equal(p1[0, :L], mapping)
    np.testing.assert_array_equal(p2[0, :L], np.arange(9))


def test_gather_aligned():
    rng = np.random.RandomState(6)
    f = rng.randn(2, 5, 3).astype(np.float32)
    path = np.array([[0, 0, 1, 4, 4], [1, 2, 3, 4, 4]], np.int32)
    out = np.asarray(gather_aligned(jnp.asarray(f), jnp.asarray(path)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], f[b][path[b]])


def test_dtw_length_one_tokens():
    """Degenerate 1-frame tokens (the reference skips these through a bare
    except, reference dataloader.py:188-190) must align cleanly here."""
    rng = np.random.RandomState(7)
    f1 = rng.randn(1, 8, 4).astype(np.float32)
    f2 = rng.randn(1, 8, 4).astype(np.float32)
    p1, p2, plen = dtw_align_batch(jnp.asarray(f1), jnp.asarray(f2),
                                   jnp.asarray([1]), jnp.asarray([6]))
    assert int(plen[0]) == 6
    np.testing.assert_array_equal(np.asarray(p1)[0, :6], np.zeros(6))
    np.testing.assert_array_equal(np.asarray(p2)[0, :6], np.arange(6))


def test_dtw_align_from_dist_api():
    """Public dispatch helper: matches dtw_align_batch and respects
    use_pallas=False (the multi-device escape hatch)."""
    from abnet3_tpu.ops.dtw import (dtw_align_batch, dtw_align_from_dist,
                                    pairwise_angular_distance)
    rng = np.random.RandomState(5)
    f1 = jnp.asarray(rng.randn(3, 16, 6).astype(np.float32))
    f2 = jnp.asarray(rng.randn(3, 16, 6).astype(np.float32))
    n = jnp.asarray([16, 12, 9], jnp.int32)
    ref = dtw_align_batch(f1, f2, n, n)
    dist = pairwise_angular_distance(f1, f2)
    for use_pallas in (True, False):
        out = dtw_align_from_dist(dist, n, n, use_pallas=use_pallas)
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onpath_from_moves_matches_walk():
    """The reverse-DP path mask marks exactly the backtrace-chain cells
    (same tie-breaking) and sums to the path length."""
    from abnet3_tpu.ops.dtw import (dtw_costs, moves_from_costs,
                                    onpath_from_moves,
                                    pairwise_angular_distance, walk_moves)
    rng = np.random.RandomState(11)
    B, T1, T2, d = 16, 23, 31, 7
    f1 = jnp.asarray(rng.randn(B, T1, d).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, T2, d).astype(np.float32))
    n1 = jnp.asarray(rng.randint(1, T1 + 1, B), jnp.int32)
    n2 = jnp.asarray(rng.randint(1, T2 + 1, B), jnp.int32)
    mv = moves_from_costs(dtw_costs(pairwise_angular_distance(f1, f2)))
    p1, p2, plen = walk_moves(mv, n1, n2)
    A = np.asarray(onpath_from_moves(mv, n1, n2))
    A_ref = np.zeros((B, T1, T2), np.float32)
    p1n, p2n, pl = np.asarray(p1), np.asarray(p2), np.asarray(plen)
    for b in range(B):
        for s in range(pl[b]):
            A_ref[b, p1n[b, s], p2n[b, s]] = 1.0
    np.testing.assert_array_equal(A, A_ref)
    np.testing.assert_array_equal(A.sum((1, 2)), pl.astype(np.float32))


def test_dtw_path_from_dist_dispatch():
    """Public mask dispatch equals the XLA reference in both branches."""
    from abnet3_tpu.ops.dtw import (dtw_costs, dtw_path_from_dist,
                                    moves_from_costs, onpath_from_moves,
                                    pairwise_angular_distance)
    rng = np.random.RandomState(12)
    f1 = jnp.asarray(rng.randn(4, 12, 5).astype(np.float32))
    f2 = jnp.asarray(rng.randn(4, 15, 5).astype(np.float32))
    n1 = jnp.asarray([12, 8, 3, 1], jnp.int32)
    n2 = jnp.asarray([15, 11, 7, 1], jnp.int32)
    dist = pairwise_angular_distance(f1, f2)
    ref = onpath_from_moves(moves_from_costs(dtw_costs(dist)), n1, n2)
    for use_pallas in (True, False):
        out = dtw_path_from_dist(dist, n1, n2, use_pallas=use_pallas)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dtw_path_stats_matches_mask_route():
    """The forward-only stats DP must reproduce the mask route exactly:
    integer-equal path lengths (same backtrace chain — the per-cell
    argmin priorities are moves_from_costs'), path sums to float-
    reduction rounding. Includes rectangular/ragged shapes and an
    all-ties constant matrix (diag-preferred chains)."""
    from abnet3_tpu.ops.dtw import dtw_path_from_dist, dtw_path_stats

    rng = np.random.RandomState(11)
    cases = []
    for _ in range(8):
        B = rng.randint(1, 7)
        T1 = rng.randint(1, 33)
        T2 = rng.randint(1, 33)
        dist = rng.rand(B, T1, T2).astype(np.float32)
        n1 = rng.randint(1, T1 + 1, B).astype(np.int32)
        n2 = rng.randint(1, T2 + 1, B).astype(np.int32)
        cases.append((dist, n1, n2))
    # engineered exact ties: constant and blockwise-constant matrices
    cases.append((np.full((3, 9, 6), 0.125, np.float32),
                  np.array([9, 4, 1], np.int32),
                  np.array([6, 6, 3], np.int32)))
    tiled = np.kron(rng.rand(2, 3, 2).astype(np.float32),
                    np.ones((1, 4, 8), np.float32))
    cases.append((tiled, np.array([12, 7], np.int32),
                  np.array([16, 9], np.int32)))
    for dist, n1, n2 in cases:
        d = jnp.asarray(dist)
        A = dtw_path_from_dist(d, jnp.asarray(n1), jnp.asarray(n2),
                               use_pallas=False)
        psum, plen = dtw_path_stats(d, jnp.asarray(n1), jnp.asarray(n2))
        np.testing.assert_array_equal(np.asarray(plen),
                                      np.asarray(jnp.sum(A, (1, 2))))
        np.testing.assert_allclose(
            np.asarray(psum), np.asarray(jnp.sum(d * A, (1, 2))),
            atol=3e-5, rtol=1e-5)
