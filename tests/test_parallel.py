"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.parallel import (make_fused_train_step, make_mesh,
                                 param_shardings, shard_array)
from jax.sharding import PartitionSpec as P


def _setup(n_data, n_model, d=16, hidden=32):
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    net = SiameseNetwork(input_dim=d, num_hidden_layers=1,
                         hidden_dim=hidden, output_dim=8, p_dropout=0.0,
                         activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.adam(1e-3)
    return mesh, net, params, state, loss, opt


def _batch(B, T, d, seed=0):
    rng = np.random.RandomState(seed)
    return (np.asarray(rng.randn(B, T, d), np.float32),
            np.asarray(rng.randn(B, T, d), np.float32),
            np.full((B,), T - 1, np.int32),
            np.full((B,), T, np.int32))


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == 8


def test_fused_step_runs_dp_tp():
    mesh, net, params, state, loss, opt = _setup(4, 2)
    opt_state = opt.init(params)
    step = make_fused_train_step(net, loss, opt, mesh)
    f1s, f2s, n1s, n2s = _batch(8, 12, 16, 0)
    f1d, f2d, n1d, n2d = _batch(8, 12, 16, 1)
    new_params, new_state, new_opt, value = step(
        params, state, opt_state, jax.random.PRNGKey(0),
        f1s, f2s, n1s, n2s, f1d, f2d, n1d, n2d)
    assert np.isfinite(float(value))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(params),
                                jax.tree_util.tree_leaves(new_params)))
    assert moved


def test_fused_step_matches_single_device():
    """The sharded fused step must compute the same loss as an unsharded
    single-device run of the same math."""
    mesh, net, params, state, loss, opt = _setup(8, 1)
    opt_state = opt.init(params)
    step = make_fused_train_step(net, loss, opt, mesh)
    f1s, f2s, n1s, n2s = _batch(8, 10, 16, 2)
    f1d, f2d, n1d, n2d = _batch(8, 10, 16, 3)
    _, _, _, value = step(params, state, opt_state, jax.random.PRNGKey(0),
                          f1s, f2s, n1s, n2s, f1d, f2d, n1d, n2d)

    # single-device reference computation
    from abnet3_tpu.ops.dtw import (align_diff_batch, dtw_align_batch,
                                    gather_aligned)
    p1, p2, plen = dtw_align_batch(jnp.asarray(f1s), jnp.asarray(f2s),
                                   jnp.asarray(n1s), jnp.asarray(n2s))
    x1s = gather_aligned(jnp.asarray(f1s), p1)
    x2s = gather_aligned(jnp.asarray(f2s), p2)
    Ls = x1s.shape[1]
    ws = (np.arange(Ls)[None, :] < np.asarray(plen)[:, None]).astype(
        np.float32)
    q1, q2, qlen = align_diff_batch(jnp.asarray(n1d), jnp.asarray(n2d),
                                    10, 10)
    x1d = gather_aligned(jnp.asarray(f1d), q1)
    x2d = gather_aligned(jnp.asarray(f2d), q2)
    Ld = x1d.shape[1]
    wd = (np.arange(Ld)[None, :] < np.asarray(qlen)[:, None]).astype(
        np.float32)
    d = 16
    x1 = jnp.concatenate([x1s.reshape(-1, d), x1d.reshape(-1, d)])
    x2 = jnp.concatenate([x2s.reshape(-1, d), x2d.reshape(-1, d)])
    y = jnp.concatenate([jnp.ones(8 * Ls), -jnp.ones(8 * Ld)])
    w = jnp.concatenate([jnp.asarray(ws).reshape(-1),
                         jnp.asarray(wd).reshape(-1)])
    e1, e2, _ = net.forward(params, state, x1, x2,
                            rng=jax.random.PRNGKey(0), train=True)
    expected = float(loss(e1, e2, y, weights=w))
    assert float(value) == pytest.approx(expected, rel=1e-5)


def test_param_shardings_tp_layout():
    mesh, net, params, state, loss, opt = _setup(4, 2)
    shardings = param_shardings(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    for path, s in flat:
        assert "model" in str(s.spec) or s.spec == P()


def test_sharded_embedding_forward():
    """Data-parallel embedding: shard frames over all 8 devices."""
    mesh, net, params, state, loss, opt = _setup(8, 1)
    x = np.random.RandomState(0).randn(64, 16).astype(np.float32)
    xs = shard_array(jnp.asarray(x), mesh, P("data"))

    @jax.jit
    def fwd(p, xx):
        out, _ = net.forward_once(p, state, xx, train=False)
        return out

    emb = fwd(params, xs)
    ref, _ = net.forward_once(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref), rtol=1e-5)


def test_mirror_shardings_param_shape_inventory():
    """mirror_shardings only TP-shards leaves whose full shape matches a
    param leaf's shape (review finding: a bare divisibility heuristic
    misfiled an optax LBFGS (m,) history-weight vector with
    m % n_model == 0 onto P('model'), resharding it every step instead
    of the replication the docstring promises)."""
    from abnet3_tpu.parallel.mesh import mirror_shardings
    mesh = make_mesh(n_data=4, n_model=2)
    params = {"w": jnp.zeros((16, 32)), "b": jnp.zeros((32,))}
    state = {"mu_w": jnp.zeros((16, 32)),       # param-shaped: TP rule
             "mu_b": jnp.zeros((32,)),          # bias-shaped: TP rule
             "history": jnp.zeros((10,)),       # 10 % 2 == 0, NOT a param
             "stacked": jnp.zeros((10, 32)),    # stacked history
             "count": jnp.zeros(())}
    sh = mirror_shardings(state, mesh, like=params)
    assert sh["mu_w"].spec == P(None, "model")
    assert sh["mu_b"].spec == P("model")
    assert sh["history"].spec == P()
    assert sh["stacked"].spec == P()
    assert sh["count"].spec == P()
    # without an inventory the old heuristic applies (back-compat)
    sh = mirror_shardings(state, mesh)
    assert sh["history"].spec == P("model")
