"""Matrix-loss train path vs the gather path.

Matrix mode (parallel/mesh.py use_matrix_loss) keeps the DTW alignment as
a (B, T, T) mask over the embedding cosine matrix instead of gathering
frames along backtraced paths: every frame embeds once, visit counts
become the BN-stat weights, and the loss is an A-weighted reduction of
cos — the same set of loss terms as the gather path, so losses and BN
statistics must agree to float precision (measured 1.67x end-to-end on
the TPU: 3.5M -> 5.9M frame-pairs/s through the K=8 chained step).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from abnet3_tpu.loss import coscos2, cosmargin, KLLoss
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.ops.bank import TokenBank
from abnet3_tpu.parallel import (make_mesh, make_pair_train_step,
                                 make_split_pair_train_step,
                                 use_matrix_loss)


def _bank(n_tokens=48, d=20, seed=0):
    rng = np.random.RandomState(seed)
    return TokenBank({i: rng.randn(rng.randint(5, 18), d)
                      .astype(np.float32) for i in range(n_tokens)})


def _net(d=20, bn=False, p_dropout=0.0):
    return SiameseNetwork(input_dim=d, num_hidden_layers=1, hidden_dim=24,
                          output_dim=8, p_dropout=p_dropout, batch_norm=bn,
                          activation_layer="sigmoid")


def _split_args(bank, Bs=8, Bd=8):
    ids1s = bank.ids(list(range(0, Bs)))
    ids2s = bank.ids(list(range(Bs, 2 * Bs)))
    ids1d = bank.ids(list(range(2 * Bs, 2 * Bs + Bd)))
    ids2d = bank.ids(list(range(2 * Bs + Bd, 2 * Bs + 2 * Bd)))
    return (ids1s, ids2s, jnp.ones(Bs), ids1d, ids2d, jnp.ones(Bd))


def test_use_matrix_loss_dispatch(monkeypatch):
    assert use_matrix_loss(coscos2())
    assert use_matrix_loss(cosmargin())
    assert use_matrix_loss(KLLoss())  # KL has a cell decomposition too
    assert not use_matrix_loss(coscos2(), extra_labels=True)
    assert not use_matrix_loss(coscos2(), override=False)
    assert not use_matrix_loss(KLLoss(), override=False)  # override wins
    monkeypatch.setenv("ABNET3_MATRIX_LOSS", "0")
    assert not use_matrix_loss(coscos2())


@pytest.mark.parametrize("bn", [False, True])
@pytest.mark.parametrize("loss_cls", [coscos2, cosmargin])
def test_split_step_matrix_matches_gather(bn, loss_cls):
    """Same single-step loss, eval loss, and BN statistics as the gather
    path (dropout off: the term sets are identical, only the summation
    order differs)."""
    bank = _bank()
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = _net(bn=bn)
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = loss_cls()
    opt = optax.sgd(1e-2)
    args = _split_args(bank)

    out = {}
    for mode in (False, True):
        step, evalf = make_split_pair_train_step(
            net, loss, opt, bank, mesh, matrix_loss=mode)
        o = opt.init(params)
        p2, s2, _, v = step(params, state, o, jax.random.PRNGKey(1), *args)
        out[mode] = (float(v), float(evalf(params, state, *args)), p2, s2)

    assert out[False][0] == pytest.approx(out[True][0], abs=1e-6)
    assert out[False][1] == pytest.approx(out[True][1], abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out[False][2]),
                    jax.tree_util.tree_leaves(out[True][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out[False][3]),
                    jax.tree_util.tree_leaves(out[True][3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("adw", [False, True])
def test_pair_step_matrix_matches_gather(adw):
    """Mixed same/diff pair batches (truncate and diagonal-stretch diff
    alignment) give the same loss in both modes."""
    bank = _bank(seed=3)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = _net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.sgd(1e-2)
    B = 12
    ids1 = bank.ids(list(range(0, B)))
    ids2 = bank.ids(list(range(B, 2 * B)))
    y_pair = jnp.asarray([1, -1] * (B // 2), jnp.float32)
    pair_w = jnp.ones(B).at[-1].set(0.0)  # one padded pair
    vals = {}
    for mode in (False, True):
        step, evalf = make_pair_train_step(
            net, loss, opt, bank, mesh, align_different_words=adw,
            matrix_loss=mode)
        o = opt.init(params)
        _, _, _, v = step(params, state, o, jax.random.PRNGKey(1),
                          ids1, ids2, y_pair, pair_w)
        vals[mode] = (float(v),
                      float(evalf(params, state, ids1, ids2, y_pair,
                                  pair_w)))
    assert vals[False][0] == pytest.approx(vals[True][0], abs=1e-6)
    assert vals[False][1] == pytest.approx(vals[True][1], abs=1e-6)


def test_split_step_matrix_tcl_matches_gather():
    """tcl frame-pair mixing joins the matrix loss with the same
    rescaled weights as the gather path."""
    rng = np.random.RandomState(5)
    bank = _bank(seed=5)
    frame_bank = jnp.asarray(rng.randn(64, 20).astype(np.float32))
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = _net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.sgd(1e-2)
    n_tcl = 16
    tcl_args = (jnp.asarray(rng.randint(0, 64, n_tcl), jnp.int32),
                jnp.asarray(rng.randint(0, 64, n_tcl), jnp.int32),
                jnp.asarray(rng.choice([1.0, -1.0], n_tcl), jnp.float32),
                jnp.ones(n_tcl).at[-3:].set(0.0))
    args = _split_args(bank) + tcl_args
    vals = {}
    for mode in (False, True):
        step, evalf = make_split_pair_train_step(
            net, loss, opt, bank, mesh, frame_bank=frame_bank, tcl=0.3,
            matrix_loss=mode)
        o = opt.init(params)
        _, _, _, v = step(params, state, o, jax.random.PRNGKey(1), *args)
        vals[mode] = (float(v), float(evalf(params, state, *args)))
    assert vals[False][0] == pytest.approx(vals[True][0], abs=1e-6)
    assert vals[False][1] == pytest.approx(vals[True][1], abs=1e-6)


def test_split_step_matrix_multi_device_matches_single():
    """Matrix mode on a data=4 x model=2 mesh (sharded Pallas path mask
    via the XLA fallback on CPU) equals the single-device loss."""
    bank = _bank(seed=7)
    net = _net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.sgd(1e-2)
    args = _split_args(bank)
    vals = {}
    for mesh in (make_mesh(n_data=1, n_model=1,
                           devices=jax.devices()[:1]),
                 make_mesh(n_data=4, n_model=2)):
        step, evalf = make_split_pair_train_step(
            net, loss, opt, bank, mesh, matrix_loss=True)
        o = opt.init(params)
        _, _, _, v = step(params, state, o, jax.random.PRNGKey(1), *args)
        vals[mesh.size] = (float(v), float(evalf(params, state, *args)))
    assert vals[1][0] == pytest.approx(vals[8][0], abs=1e-5)
    assert vals[1][1] == pytest.approx(vals[8][1], abs=1e-5)


def test_matrix_chained_steps_match_unchained():
    """K-chained matrix dispatch equals K single matrix steps."""
    bank = _bank(seed=9)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = _net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.adam(1e-3)
    K = 3
    rng_ids = np.random.RandomState(1)
    batches = []
    for _ in range(K):
        perm = rng_ids.permutation(48)
        batches.append((bank.ids(list(perm[:8])), bank.ids(list(perm[8:16])),
                        jnp.ones(8), bank.ids(list(perm[16:24])),
                        bank.ids(list(perm[24:32])), jnp.ones(8)))

    step1, _ = make_split_pair_train_step(net, loss, opt, bank, mesh,
                                          matrix_loss=True)
    p1, s1, o1 = params, state, opt.init(params)
    rng = jax.random.PRNGKey(4)
    for k, b in enumerate(batches):
        p1, s1, o1, _ = step1(p1, s1, o1, jax.random.fold_in(rng, k), *b)

    stepK, _ = make_split_pair_train_step(net, loss, opt, bank, mesh,
                                          steps_per_call=K,
                                          matrix_loss=True)
    stacked = tuple(jnp.stack([b[i] for b in batches])
                    for i in range(6))
    pK, sK, oK, _ = stepK(params, state, opt.init(params), rng, *stacked)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def _multi_net(d=20):
    from abnet3_tpu.models import SiameseMultitaskNetwork
    return SiameseMultitaskNetwork(
        input_dim=d, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=24, output_dim=8,
        p_dropout=0.0, activation_layer="sigmoid")


def _multi_loss():
    from abnet3_tpu.loss import weighted_loss_multi
    return weighted_loss_multi(weight=0.4, loss_spk=coscos2(),
                               loss_phn=cosmargin(margin=0.3))


def test_multitask_split_step_matrix_matches_gather():
    """Multitask matrix mode: per-head cosine matrices under the same
    alignment mask give the gather path's loss exactly."""
    rng = np.random.RandomState(13)
    bank = _bank(seed=13)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = _multi_net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = _multi_loss()
    assert use_matrix_loss(loss, extra_labels=True)
    opt = optax.sgd(1e-2)
    yspk_s = jnp.asarray(rng.choice([1.0, -1.0], 8), jnp.float32)
    yspk_d = jnp.asarray(rng.choice([1.0, -1.0], 8), jnp.float32)
    args = _split_args(bank) + (yspk_s, yspk_d)
    vals = {}
    for mode in (False, True):
        step, evalf = make_split_pair_train_step(
            net, loss, opt, bank, mesh, extra_labels=True,
            matrix_loss=mode)
        o = opt.init(params)
        _, _, _, v = step(params, state, o, jax.random.PRNGKey(1), *args)
        vals[mode] = (float(v), float(evalf(params, state, *args)))
    assert vals[False][0] == pytest.approx(vals[True][0], abs=1e-6)
    assert vals[False][1] == pytest.approx(vals[True][1], abs=1e-6)


def test_multitask_pair_step_matrix_matches_gather():
    rng = np.random.RandomState(14)
    bank = _bank(seed=14)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = _multi_net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = _multi_loss()
    opt = optax.sgd(1e-2)
    B = 12
    ids1 = bank.ids(list(range(0, B)))
    ids2 = bank.ids(list(range(B, 2 * B)))
    y_pair = jnp.asarray([1, -1] * (B // 2), jnp.float32)
    y_spk = jnp.asarray(rng.choice([1.0, -1.0], B), jnp.float32)
    pair_w = jnp.ones(B).at[0].set(0.0)
    vals = {}
    for mode in (False, True):
        step, evalf = make_pair_train_step(
            net, loss, opt, bank, mesh, extra_labels=True,
            matrix_loss=mode)
        o = opt.init(params)
        _, _, _, v = step(params, state, o, jax.random.PRNGKey(1),
                          ids1, ids2, y_pair, y_spk, pair_w)
        vals[mode] = (float(v),
                      float(evalf(params, state, ids1, ids2, y_pair,
                                  y_spk, pair_w)))
    assert vals[False][0] == pytest.approx(vals[True][0], abs=1e-6)
    assert vals[False][1] == pytest.approx(vals[True][1], abs=1e-6)


def test_kl_split_step_matrix_matches_gather():
    """KLLoss trains matrix-mode: two entropy-minus-matmul cell matrices
    under the alignment mask equal the gathered-row KL (softmax-output
    net, the reference's KL recipe)."""
    bank = _bank(seed=21)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=20, num_hidden_layers=1, hidden_dim=24,
                         output_dim=8, p_dropout=0.0,
                         activation_layer="softmax")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = KLLoss(margin=1.0)
    assert use_matrix_loss(loss)
    opt = optax.sgd(1e-2)
    args = _split_args(bank)
    vals = {}
    for mode in (False, True):
        step, evalf = make_split_pair_train_step(
            net, loss, opt, bank, mesh, matrix_loss=mode)
        o = opt.init(params)
        _, _, _, v = step(params, state, o, jax.random.PRNGKey(1), *args)
        vals[mode] = (float(v), float(evalf(params, state, *args)))
    # pair_cells computes log p - log q instead of log(p/q): ~1e-6 fp
    assert vals[False][0] == pytest.approx(vals[True][0], abs=2e-5)
    assert vals[False][1] == pytest.approx(vals[True][1], abs=2e-5)


def test_matrix_matches_gather_fuzz():
    """Randomized configs (dims, group sizes, loss, bn, alignment mode)
    all give identical matrix/gather losses — guards the parity contract
    beyond the hand-picked cases above."""
    rng = np.random.RandomState(42)
    from abnet3_tpu.loss import KLLoss as _KL
    for trial in range(5):
        d = int(rng.choice([6, 20, 33]))
        Bs = int(rng.randint(2, 9))
        Bd = int(rng.randint(2, 9))
        bn = bool(rng.randint(2))
        adw = bool(rng.randint(2))
        loss_cls = [coscos2, cosmargin, _KL][trial % 3]
        act = "softmax" if loss_cls is _KL else "sigmoid"
        bank = TokenBank({i: rng.randn(rng.randint(3, 14), d)
                          .astype(np.float32)
                          for i in range(2 * (Bs + Bd))})
        net = SiameseNetwork(input_dim=d, num_hidden_layers=1,
                             hidden_dim=16, output_dim=7, p_dropout=0.0,
                             batch_norm=bn, activation_layer=act)
        params, state = net.init_params(jax.random.PRNGKey(trial))
        loss = loss_cls()
        mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
        ids = rng.permutation(2 * (Bs + Bd)).astype(np.int32)
        args = (ids[:Bs], ids[Bs:2 * Bs],
                jnp.asarray(rng.rand(Bs), jnp.float32),
                ids[2 * Bs:2 * Bs + Bd], ids[2 * Bs + Bd:],
                jnp.asarray(rng.rand(Bd), jnp.float32))
        vals = {}
        for mode in (False, True):
            _, evalf = make_split_pair_train_step(
                net, loss, optax.sgd(1e-2), bank, mesh,
                align_different_words=adw, matrix_loss=mode)
            vals[mode] = float(evalf(params, state, *args))
        assert vals[False] == pytest.approx(vals[True], abs=3e-5), (
            trial, d, Bs, Bd, bn, adw, loss_cls.__name__)


def test_multitask_stretch_matrix_matches_gather():
    """Multitask + diagonal-stretch diff alignment (the full-mask diff
    branch with per-pair speaker labels broadcast over (B,T,T) cells)."""
    rng = np.random.RandomState(17)
    bank = _bank(seed=17)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = _multi_net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = _multi_loss()
    opt = optax.sgd(1e-2)
    yspk_s = jnp.asarray(rng.choice([1.0, -1.0], 8), jnp.float32)
    yspk_d = jnp.asarray(rng.choice([1.0, -1.0], 8), jnp.float32)
    args = _split_args(bank) + (yspk_s, yspk_d)
    vals = {}
    for mode in (False, True):
        step, evalf = make_split_pair_train_step(
            net, loss, opt, bank, mesh, extra_labels=True,
            align_different_words=True, matrix_loss=mode)
        o = opt.init(params)
        _, _, _, v = step(params, state, o, jax.random.PRNGKey(1), *args)
        vals[mode] = (float(v), float(evalf(params, state, *args)))
    assert vals[False][0] == pytest.approx(vals[True][0], abs=1e-6)
    assert vals[False][1] == pytest.approx(vals[True][1], abs=1e-6)


def test_chained_eval_multi_device_matches_single_steps():
    """K-stacked eval dispatch on a data=4 x model=2 mesh returns the
    same per-batch losses as K single-device single evals."""
    bank = _bank(seed=23)
    net = _net()
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.sgd(1e-2)
    rng_ids = np.random.RandomState(2)
    batches = []
    for _ in range(3):
        perm = rng_ids.permutation(48)
        batches.append((bank.ids(list(perm[:8])),
                        bank.ids(list(perm[8:16])), jnp.ones(8),
                        bank.ids(list(perm[16:24])),
                        bank.ids(list(perm[24:32])), jnp.ones(8)))
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    _, eval1 = make_split_pair_train_step(net, loss, opt, bank, mesh1)
    singles = [float(eval1(params, state, *b)) for b in batches]

    mesh8 = make_mesh(n_data=4, n_model=2)
    _, evalK = make_split_pair_train_step(net, loss, opt, bank, mesh8,
                                          steps_per_call=3)
    stacked = tuple(jnp.stack([b[i] for b in batches]) for i in range(6))
    chained = np.asarray(evalK(params, state, *stacked))
    assert chained.shape == (3,)
    for a, b in zip(singles, chained):
        assert a == pytest.approx(float(b), abs=1e-5)
