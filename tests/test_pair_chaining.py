"""K-chained dispatch for the mixed-pair bank step (round-2 weak #5).

make_pair_train_step(steps_per_call=K) lax.scans K optimizer steps per
dispatch and its eval twin scans K losses; both must be update- and
value-equivalent to K unchained calls (same contract as the split
factory, tests/test_matrix_loss.py chained tests).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.ops.bank import TokenBank
from abnet3_tpu.parallel import make_mesh, make_pair_train_step


def _bank(n_tokens=32, d=12, seed=0):
    rng = np.random.RandomState(seed)
    return TokenBank({i: rng.randn(rng.randint(5, 14), d)
                      .astype(np.float32) for i in range(n_tokens)})


def _mixed_batches(bank, K, B=8, seed=1):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(K):
        perm = rng.permutation(len(bank))
        y = np.where(np.arange(B) % 2 == 0, 1.0, -1.0).astype(np.float32)
        batches.append((bank.ids(list(perm[:B])),
                        bank.ids(list(perm[B:2 * B])),
                        jnp.asarray(y), jnp.ones(B)))
    return batches


@pytest.mark.parametrize("matrix", [False, True])
def test_pair_chained_steps_match_unchained(matrix):
    bank = _bank()
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=12, num_hidden_layers=1, hidden_dim=16,
                         output_dim=6, p_dropout=0.0,
                         activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.adam(1e-3)
    K = 3
    batches = _mixed_batches(bank, K)

    step1, _ = make_pair_train_step(net, loss, opt, bank, mesh,
                                    matrix_loss=matrix)
    p1, s1, o1 = params, state, opt.init(params)
    rng = jax.random.PRNGKey(4)
    vals1 = []
    for k, b in enumerate(batches):
        p1, s1, o1, v = step1(p1, s1, o1, jax.random.fold_in(rng, k), *b)
        vals1.append(float(v))

    stepK, _ = make_pair_train_step(net, loss, opt, bank, mesh,
                                    steps_per_call=K, matrix_loss=matrix)
    stacked = tuple(jnp.stack([b[i] for b in batches]) for i in range(4))
    pK, sK, oK, vK = stepK(params, state, opt.init(params), rng, *stacked)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert float(vK) == pytest.approx(np.mean(vals1), rel=1e-6)


def test_pair_chained_eval_matches_single():
    bank = _bank(seed=2)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=12, num_hidden_layers=1, hidden_dim=16,
                         output_dim=6, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    loss = coscos2()
    opt = optax.adam(1e-3)
    K = 4
    batches = _mixed_batches(bank, K, seed=3)

    _, eval1 = make_pair_train_step(net, loss, opt, bank, mesh)
    singles = [float(eval1(net.params, net.state, *b)) for b in batches]

    _, evalK = make_pair_train_step(net, loss, opt, bank, mesh,
                                    steps_per_call=K)
    stacked = tuple(jnp.stack([b[i] for b in batches]) for i in range(4))
    values = np.asarray(evalK(net.params, net.state, *stacked))
    assert values.shape == (K,)
    np.testing.assert_allclose(values, singles, rtol=1e-6)


def test_pair_chained_multi_device():
    """The K-chained mixed step compiles and runs over a >1-device mesh
    with an odd batch (pad to the data axis)."""
    bank = _bank(seed=5)
    mesh = make_mesh(n_data=4, n_model=1)
    net = SiameseNetwork(input_dim=12, num_hidden_layers=1, hidden_dim=16,
                         output_dim=6, p_dropout=0.0,
                         activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.adam(1e-3)
    K = 2
    B = 7  # not divisible by 4 -> _pad_groups pads to 8
    rng_ids = np.random.RandomState(0)
    batches = []
    for _ in range(K):
        perm = rng_ids.permutation(len(bank))
        y = np.where(np.arange(B) % 2 == 0, 1.0, -1.0).astype(np.float32)
        batches.append((bank.ids(list(perm[:B])),
                        bank.ids(list(perm[B:2 * B])),
                        jnp.asarray(y), jnp.ones(B)))
    stepK, evalK = make_pair_train_step(net, loss, opt, bank, mesh,
                                        steps_per_call=K)
    stacked = tuple(jnp.stack([b[i] for b in batches]) for i in range(4))
    p, s, o, v = stepK(params, state, opt.init(params),
                       jax.random.PRNGKey(0), *stacked)
    assert np.isfinite(float(v))
    values = np.asarray(evalK(params, state, *stacked))
    assert values.shape == (K,) and np.isfinite(values).all()
