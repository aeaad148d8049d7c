"""Model tests: gradient flow through every layer (the reference's core
model test, reference test_model.py:43-96), fused-forward consistency,
save/load roundtrip, batch-norm and dropout behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from abnet3_tpu.loss import coscos2, cosmargin
from abnet3_tpu.models import SiameseMultitaskNetwork, SiameseNetwork

NETWORK_CONFIGS = [
    dict(input_dim=10, num_hidden_layers=2, hidden_dim=8, output_dim=5,
         p_dropout=0.0, batch_norm=False, type_init="xavier_uni",
         activation_layer="relu"),
    dict(input_dim=10, num_hidden_layers=1, hidden_dim=8, output_dim=5,
         p_dropout=0.1, batch_norm=True, type_init="xavier_normal",
         activation_layer="sigmoid"),
    dict(input_dim=10, num_hidden_layers=3, hidden_dim=8, output_dim=5,
         p_dropout=0.0, batch_norm=False, type_init="orthogonal",
         activation_layer="tanh"),
]


def _batch(n=32, d=10, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(n, d).astype(np.float32)),
            jnp.asarray(rng.randn(n, d).astype(np.float32)),
            jnp.asarray(rng.choice([1, -1], n).astype(np.float32)))


@pytest.mark.parametrize("config", NETWORK_CONFIGS)
@pytest.mark.parametrize("loss_cls", [coscos2, cosmargin])
@pytest.mark.parametrize("opt_name", ["sgd", "adam"])
def test_all_weights_update(config, loss_cls, opt_name):
    """One optimizer step must move every parameter leaf
    (gradient-flow smoke test mirroring reference test_model.py:43-96)."""
    net = SiameseNetwork(**config)
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = loss_cls()
    opt = optax.sgd(0.5) if opt_name == "sgd" else optax.adam(1e-2)
    opt_state = opt.init(params)
    x1, x2, y = _batch()

    def loss_fn(p):
        e1, e2, new_state = net.forward(p, state, x1, x2,
                                        rng=jax.random.PRNGKey(1), train=True)
        return loss(e1, e2, y)

    grads = jax.grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree_util.tree_leaves(new_params)
    for (path, old), new in zip(flat_old, flat_new):
        assert not np.allclose(np.asarray(old), np.asarray(new)), \
            f"parameter {path} did not update"


def test_fused_forward_matches_forward_once():
    net = SiameseNetwork(input_dim=10, num_hidden_layers=2, hidden_dim=16,
                         output_dim=4, p_dropout=0.0,
                         activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    x1, x2, _ = _batch()
    e1, e2, _ = net.forward(params, state, x1, x2, train=False)
    s1, _ = net.forward_once(params, state, x1, train=False)
    s2, _ = net.forward_once(params, state, x2, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(s1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(s2), rtol=1e-6)


def test_save_load_roundtrip(tmp_path):
    net = SiameseNetwork(input_dim=10, num_hidden_layers=1, hidden_dim=8,
                         output_dim=5, activation_layer="relu",
                         output_path=str(tmp_path / "network"))
    params, state = net.init_params(jax.random.PRNGKey(0))
    net.params, net.state = params, state
    net.save_network()

    net2 = SiameseNetwork(input_dim=10, num_hidden_layers=1, hidden_dim=8,
                          output_dim=5, activation_layer="relu")
    net2.load_network(str(tmp_path / "network.pth"))
    x1, x2, _ = _batch()
    e1, _, _ = net.forward(params, state, x1, x2, train=False)
    f1, _, _ = net2.forward(net2.params, net2.state, x1, x2, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(f1))


def test_epoch_checkpoint_naming(tmp_path):
    net = SiameseNetwork(input_dim=4, num_hidden_layers=0, hidden_dim=4,
                         output_dim=2, activation_layer="relu",
                         output_path=str(tmp_path / "network"))
    net.ensure_init()
    net.save_network(epoch=3)
    assert (tmp_path / "network3.pth").exists()


def test_dropout_only_at_train():
    net = SiameseNetwork(input_dim=10, num_hidden_layers=1, hidden_dim=64,
                         output_dim=8, p_dropout=0.5,
                         activation_layer="relu")
    params, state = net.init_params(jax.random.PRNGKey(0))
    x1, x2, _ = _batch()
    # eval is deterministic
    a, _ = net.forward_once(params, state, x1, train=False)
    b, _ = net.forward_once(params, state, x1, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train with different rngs differs
    c, _ = net.forward_once(params, state, x1, rng=jax.random.PRNGKey(1),
                            train=True)
    d, _ = net.forward_once(params, state, x1, rng=jax.random.PRNGKey(2),
                            train=True)
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_batchnorm_state_updates():
    net = SiameseNetwork(input_dim=10, num_hidden_layers=1, hidden_dim=8,
                         output_dim=5, p_dropout=0.0, batch_norm=True,
                         activation_layer="relu")
    params, state = net.init_params(jax.random.PRNGKey(0))
    x1, x2, _ = _batch()
    _, _, new_state = net.forward(params, state, x1, x2, train=True)
    # running stats must have moved
    changed = False
    for k in state:
        if not np.allclose(np.asarray(state[k]["mean"]),
                           np.asarray(new_state[k]["mean"])):
            changed = True
    assert changed
    # eval mode does not touch state
    _, _, st2 = net.forward(params, new_state, x1, x2, train=False)
    for k in new_state:
        np.testing.assert_array_equal(np.asarray(new_state[k]["mean"]),
                                      np.asarray(st2[k]["mean"]))


def test_last_non_linearity_none_gives_linear_output():
    net = SiameseNetwork(input_dim=10, num_hidden_layers=0, hidden_dim=8,
                         output_dim=5, p_dropout=0.0,
                         activation_layer="sigmoid", last_non_linearity=None)
    params, state = net.init_params(jax.random.PRNGKey(0))
    x1, _, _ = _batch()
    out, _ = net.forward_once(params, state, x1, train=False)
    # sigmoid would bound output to (0,1); linear output can be negative
    assert np.asarray(out).min() < 0


def test_multitask_network():
    net = SiameseMultitaskNetwork(
        input_dim=10, num_hidden_layers_shared=2, num_hidden_layers_spk=1,
        num_hidden_layers_phn=1, hidden_dim=8, output_dim=5, p_dropout=0.0,
        activation_layer="relu")
    params, state = net.init_params(jax.random.PRNGKey(0))
    x1, x2, y = _batch()
    spk1, phn1, spk2, phn2, _ = net.forward(params, state, x1, x2,
                                            train=False)
    assert spk1.shape == (32, 5) and phn2.shape == (32, 5)
    # gradient flows to every leaf through the weighted multitask loss
    from abnet3_tpu.loss import weighted_loss_multi
    loss = weighted_loss_multi(weight=0.5, loss_phn=coscos2(),
                               loss_spk=coscos2())

    def loss_fn(p):
        s1, p1, s2, p2, _ = net.forward(p, state, x1, x2, train=True)
        return loss(s1, p1, s2, p2, y, -y)

    grads = jax.grad(loss_fn)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.any(np.asarray(g) != 0), f"zero grad at {path}"


def test_xavier_init_statistics():
    """xavier_uniform bound check: |w| <= gain*sqrt(6/(fan_in+fan_out))."""
    net = SiameseNetwork(input_dim=100, num_hidden_layers=0, hidden_dim=200,
                         output_dim=50, activation_layer="relu",
                         type_init="xavier_uni")
    params, _ = net.init_params(jax.random.PRNGKey(0))
    w = np.asarray(params["layer_0"]["w"])
    bound = np.sqrt(2.0) * np.sqrt(6.0 / (100 + 200))
    assert np.abs(w).max() <= bound + 1e-6
    assert np.abs(w).max() > bound * 0.95  # actually fills the range
    b = np.asarray(params["layer_0"]["b"])
    assert np.all(b == 0)


def test_dropout_rbg_mask_fraction_and_determinism():
    """Dropout re-keys onto the rbg PRNG (nn._dropout_key): same caller
    key -> identical masks; drop fraction ~= p; kept values scaled."""
    from abnet3_tpu.nn import Tower, TowerSpec
    spec = TowerSpec(dims=[16, 16], activations=[None], p_dropout=0.5)
    tower = Tower(spec)
    params, state = tower.init(jax.random.PRNGKey(0))
    # identity-ish probe: measure the mask through a linear layer by
    # comparing train vs eval outputs elementwise
    x = np.ones((4096, 16), np.float32)
    ev, _ = tower.apply(params, state, jnp.asarray(x), train=False)
    t1, _ = tower.apply(params, state, jnp.asarray(x),
                        rng=jax.random.PRNGKey(7), train=True)
    t2, _ = tower.apply(params, state, jnp.asarray(x),
                        rng=jax.random.PRNGKey(7), train=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    ev, t1 = np.asarray(ev), np.asarray(t1)
    dropped = t1 == 0.0
    frac = dropped.mean()
    assert 0.45 < frac < 0.55, frac
    # kept entries are scaled by 1/keep
    kept = ~dropped & (np.abs(ev) > 1e-6)
    np.testing.assert_allclose(t1[kept], ev[kept] * 2.0, rtol=1e-5)
