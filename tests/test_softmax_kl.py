"""Softmax-output networks + KLLoss (the reference's distribution recipe,
reference model.py:19-23 + loss.py:108-137)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from abnet3_tpu.loss import KLLoss, coscos2, kl_loss_fn
from abnet3_tpu.models import SiameseMultitaskNetwork, SiameseNetwork

D, OUT, N = 6, 5, 32


def _net(activation, **kw):
    return SiameseNetwork(input_dim=D, num_hidden_layers=1, hidden_dim=8,
                          output_dim=OUT, p_dropout=0.0,
                          activation_layer=activation, **kw)


def test_softmax_outputs_are_distributions():
    net = _net("softmax")
    params, state = net.init_params(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(N, D).astype(np.float32)
    e, _ = net.forward_once(params, state, x, train=False)
    e = np.asarray(e)
    assert np.all(e > 0)
    np.testing.assert_allclose(e.sum(axis=1), 1.0, rtol=1e-5)


def test_softmax_multitask_allowed():
    net = SiameseMultitaskNetwork(
        input_dim=D, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=8, output_dim=OUT,
        p_dropout=0.0, activation_layer="softmax")
    params, state = net.init_params(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(N, D).astype(np.float32)
    spk, phn, _ = net.forward_once(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(spk).sum(1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(phn).sum(1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("activation",
                         ["relu", "sigmoid", "tanh", "softmax"])
@pytest.mark.parametrize("loss_cls", [coscos2, KLLoss])
def test_activation_loss_grid_trains(activation, loss_cls):
    """Every activation x loss combination trains: finite decreasing loss,
    parameters move. KL over tanh outputs is undefined (log of negatives,
    NaN in the reference too) — the one combination that is skipped; relu
    zeros are covered by the eps guard."""
    if loss_cls is KLLoss and activation == "tanh":
        pytest.skip("KL needs positive distributions; tanh emits negatives")
    rng = np.random.RandomState(1)
    x1 = rng.randn(N, D).astype(np.float32)
    x2 = (x1 + 0.1 * rng.randn(N, D)).astype(np.float32)
    y = np.asarray([1.0, -1.0] * (N // 2), np.float32)
    net = _net(activation)
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = loss_cls()
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            e1, e2, _ = net.forward(p, state, x1, x2, train=False)
            return loss(e1, e2, y)
        value, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    first = None
    for _ in range(20):
        params, opt_state, value = step(params, opt_state)
        assert np.isfinite(float(value))
        if first is None:
            first = float(value)
    assert float(value) < first + 1e-6


def test_kl_loss_torch_parity():
    """Value parity with the reference formula (hinge-embedded symmetric
    KL, reference loss.py:127-137) on well-conditioned distributions."""
    rng = np.random.RandomState(0)
    logits1 = rng.randn(N, OUT).astype(np.float32)
    logits2 = rng.randn(N, OUT).astype(np.float32)
    p1 = np.exp(logits1) / np.exp(logits1).sum(1, keepdims=True)
    p2 = np.exp(logits2) / np.exp(logits2).sum(1, keepdims=True)
    y = np.asarray([1.0, -1.0] * (N // 2), np.float32)

    t1, t2, ty = map(torch.tensor, (p1, p2, y))
    kld1 = torch.sum(t1 * torch.log(t1 / t2), 1)
    kld2 = torch.sum(t2 * torch.log(t2 / t1), 1)
    hinge = torch.nn.HingeEmbeddingLoss(margin=1.0)
    expected = float(hinge(kld1, ty) + hinge(kld2, ty))

    got = float(kl_loss_fn(jnp.asarray(p1), jnp.asarray(p2),
                           jnp.asarray(y)))
    assert got == pytest.approx(expected, rel=1e-4)


def test_kl_loss_padded_zero_rows_stay_finite():
    """All-zero padded rows at weight 0 must not poison the loss with NaN
    (0 * log(0/0) = nan and 0 * nan = nan without the eps guard)."""
    rng = np.random.RandomState(0)
    logits = rng.randn(N, OUT).astype(np.float32)
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    pad = np.zeros((4, OUT), np.float32)
    p1 = np.vstack([p, pad])
    p2 = np.vstack([np.roll(p, 1, axis=0), pad])
    y = np.asarray([1.0, -1.0] * (N // 2) + [1.0] * 4, np.float32)
    w = np.asarray([1.0] * N + [0.0] * 4, np.float32)
    padded = float(kl_loss_fn(jnp.asarray(p1), jnp.asarray(p2),
                              jnp.asarray(y), weights=jnp.asarray(w)))
    base = float(kl_loss_fn(jnp.asarray(p), jnp.asarray(np.roll(p, 1, 0)),
                            jnp.asarray(y[:N]),
                            weights=jnp.ones(N, np.float32)))
    assert np.isfinite(padded)
    assert padded == pytest.approx(base, rel=1e-5)
