"""Pallas DTW DP kernel vs the XLA row scan (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from abnet3_tpu.ops.dtw import dtw_costs
from abnet3_tpu.ops.pallas_dtw import BLOCK_B, dtw_costs_pallas


@pytest.mark.parametrize("shape", [(3, 16, 24), (8, 32, 32), (9, 8, 128)])
def test_pallas_matches_scan(shape):
    rng = np.random.RandomState(0)
    dist = rng.rand(*shape).astype(np.float32)
    D0 = np.asarray(dtw_costs(jnp.asarray(dist)))
    D1 = np.asarray(dtw_costs_pallas(jnp.asarray(dist), interpret=True))
    np.testing.assert_allclose(D1, D0, rtol=1e-4, atol=1e-4)


def test_pallas_batch_padding():
    """B not a multiple of BLOCK_B gets padded internally and sliced."""
    rng = np.random.RandomState(1)
    dist = rng.rand(BLOCK_B + 3, 16, 16).astype(np.float32)
    D1 = np.asarray(dtw_costs_pallas(jnp.asarray(dist), interpret=True))
    assert D1.shape == dist.shape


@pytest.mark.parametrize("shape", [(3, 16, 24), (8, 32, 32), (9, 8, 128)])
def test_pallas_moves_match_xla(shape):
    """Fused DP+move kernel emits exactly the XLA move matrix."""
    from abnet3_tpu.ops.dtw import moves_from_costs
    from abnet3_tpu.ops.pallas_dtw import dtw_moves_pallas
    rng = np.random.RandomState(2)
    dist = rng.rand(*shape).astype(np.float32)
    m0 = np.asarray(moves_from_costs(dtw_costs(jnp.asarray(dist))))
    m1 = np.asarray(dtw_moves_pallas(jnp.asarray(dist), interpret=True))
    assert m1.dtype == np.int8
    np.testing.assert_array_equal(m1, m0)


def test_moves_auto_flag(monkeypatch):
    """dtw_moves_auto honors ABNET3_PALLAS_DTW (interpret-safe on CPU the
    flag stays off; here we just check the default path equivalence)."""
    from abnet3_tpu.ops.dtw import dtw_moves_auto, moves_from_costs
    rng = np.random.RandomState(3)
    dist = jnp.asarray(rng.rand(4, 16, 16).astype(np.float32))
    monkeypatch.delenv("ABNET3_PALLAS_DTW", raising=False)
    np.testing.assert_array_equal(
        np.asarray(dtw_moves_auto(dist)),
        np.asarray(moves_from_costs(dtw_costs(dist))))


def test_pallas_moves_sharded_matches_single_device():
    """shard_map over the 8-device 'data' axis gives exactly the
    single-device fused-kernel moves AND the XLA move matrix (interpret
    mode; on TPU the same wrapper keeps the Pallas win on multi-chip
    meshes, parallel/mesh.py)."""
    import jax
    from abnet3_tpu.ops.dtw import moves_from_costs
    from abnet3_tpu.ops.pallas_dtw import (dtw_moves_pallas,
                                           dtw_moves_pallas_sharded)
    from abnet3_tpu.parallel import make_mesh
    rng = np.random.RandomState(4)
    dist = jnp.asarray(rng.rand(16, 16, 24).astype(np.float32))
    single = np.asarray(dtw_moves_pallas(dist, interpret=True))
    for n_data, n_model in ((8, 1), (4, 2)):
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        sharded = np.asarray(
            dtw_moves_pallas_sharded(dist, mesh, interpret=True))
        np.testing.assert_array_equal(sharded, single)
    np.testing.assert_array_equal(
        single, np.asarray(moves_from_costs(dtw_costs(dist))))


def test_pallas_sharded_inside_jitted_step():
    """dtw_align_from_dist(mesh=...) composes with jit on a >1-device
    mesh (the path the pjit step factories trace when Pallas is on)."""
    import jax
    from abnet3_tpu.ops.dtw import walk_moves
    from abnet3_tpu.ops.pallas_dtw import dtw_moves_pallas_sharded
    from abnet3_tpu.parallel import make_mesh
    rng = np.random.RandomState(5)
    dist = jnp.asarray(rng.rand(8, 16, 16).astype(np.float32))
    n1 = jnp.full((8,), 16, jnp.int32)
    n2 = jnp.full((8,), 13, jnp.int32)
    mesh = make_mesh(n_data=8, n_model=1)

    @jax.jit
    def aligned(d):
        move = dtw_moves_pallas_sharded(d, mesh, interpret=True)
        return walk_moves(move, n1, n2)

    p1, p2, plen = aligned(dist)
    from abnet3_tpu.ops.dtw import dtw_align_from_dist
    q1, q2, qlen = dtw_align_from_dist(dist, n1, n2, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(plen), np.asarray(qlen))


@pytest.mark.parametrize("shape", [(3, 16, 24), (8, 32, 32), (9, 8, 128)])
def test_pallas_path_matches_xla(shape):
    """Fused forward+reverse kernel emits exactly the XLA path mask."""
    from abnet3_tpu.ops.dtw import onpath_from_moves, moves_from_costs
    from abnet3_tpu.ops.pallas_dtw import dtw_path_pallas
    rng = np.random.RandomState(4)
    B, T1, T2 = shape
    dist = jnp.asarray(rng.rand(*shape).astype(np.float32))
    n1 = jnp.asarray(rng.randint(1, T1 + 1, B), jnp.int32)
    n2 = jnp.asarray(rng.randint(1, T2 + 1, B), jnp.int32)
    ref = onpath_from_moves(moves_from_costs(dtw_costs(dist)), n1, n2)
    out = dtw_path_pallas(dist, n1, n2, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_path_sharded_matches_single_device():
    from abnet3_tpu.ops.dtw import onpath_from_moves, moves_from_costs
    from abnet3_tpu.ops.pallas_dtw import dtw_path_pallas_sharded
    from abnet3_tpu.parallel import make_mesh
    rng = np.random.RandomState(6)
    dist = jnp.asarray(rng.rand(16, 12, 20).astype(np.float32))
    n1 = jnp.asarray(rng.randint(1, 13, 16), jnp.int32)
    n2 = jnp.asarray(rng.randint(1, 21, 16), jnp.int32)
    ref = onpath_from_moves(moves_from_costs(dtw_costs(dist)), n1, n2)
    for mesh in (make_mesh(n_data=8, n_model=1),
                 make_mesh(n_data=4, n_model=2)):
        out = dtw_path_pallas_sharded(dist, n1, n2, mesh, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_path_tie_breaking_matches_xla():
    """Quantized distances force frequent DP ties; the kernels must make
    exactly the XLA path's argmin choices (diag > up > left preference)
    so masks stay bit-identical."""
    from abnet3_tpu.ops.dtw import (moves_from_costs, onpath_from_moves)
    from abnet3_tpu.ops.pallas_dtw import dtw_path_pallas, dtw_moves_pallas
    rng = np.random.RandomState(9)
    B, T1, T2 = 16, 24, 24
    dist = jnp.asarray(
        rng.choice([0.0, 0.5, 1.0], (B, T1, T2)).astype(np.float32))
    n1 = jnp.asarray(rng.randint(1, T1 + 1, B), jnp.int32)
    n2 = jnp.asarray(rng.randint(1, T2 + 1, B), jnp.int32)
    mv_ref = moves_from_costs(dtw_costs(dist))
    np.testing.assert_array_equal(
        np.asarray(dtw_moves_pallas(dist, interpret=True)),
        np.asarray(mv_ref))
    np.testing.assert_array_equal(
        np.asarray(dtw_path_pallas(dist, n1, n2, interpret=True)),
        np.asarray(onpath_from_moves(mv_ref, n1, n2)))
