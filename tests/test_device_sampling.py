"""On-device pair sampler + fully fused sampled train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.ops.bank import TokenBank
from abnet3_tpu.ops.sampling import DevicePairSampler
from abnet3_tpu.parallel import make_mesh, make_sampled_train_step
from abnet3_tpu.sampler import SamplerClusterSiamese

from test_sampler import CLASSES, SPKID  # noqa: F401


@pytest.fixture
def setup(tmp_path):
    p = tmp_path / "test.classes"
    p.write_text(CLASSES)
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(str(p))
    descr = sampler.analyze_clusters(clusters, SPKID)
    proba = sampler.type_speaker_sampling_p(descr, "log", "log")
    # one bank token per descr token, in descr order
    rng = np.random.RandomState(0)
    token_feats = {i: rng.randn(rng.randint(5, 20), 6).astype(np.float32)
                   for i in range(len(descr["tokens"]))}
    bank = TokenBank(token_feats)
    return descr, proba, bank


def test_device_sampler_labels_and_groups(setup):
    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=256,
                                ratio_same_diff_spk=0.5,
                                ratio_same_diff_type=0.5)
    ids1, ids2, y = sampler.sample(jax.random.PRNGKey(0))
    ids1, ids2, y = map(np.asarray, (ids1, ids2, y))
    assert ids1.shape == (256,)
    types = np.asarray(descr["tokens_type"])
    spks = np.asarray(descr["tokens_speaker"])
    # same-type labels really pair same-type tokens, and vice versa
    same = y > 0
    np.testing.assert_array_equal(types[ids1[same]], types[ids2[same]])
    assert np.all(types[ids1[~same]] != types[ids2[~same]])
    # same-type same-speaker pairs never reuse one token twice
    ss = same & (spks[ids1] == spks[ids2])
    assert np.all(ids1[ss] != ids2[ss])
    # roughly half same / half diff type with 0.5 ratios
    assert 0.3 < same.mean() < 0.7


def test_device_sampler_distribution(setup):
    """Sampled pair keys follow the compiled distributions: tokens from
    bigger clusters appear more often under 'f2' weighting."""
    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=512)
    counts = np.zeros(len(descr["tokens"]))
    for s in range(20):
        ids1, ids2, _ = sampler.sample(jax.random.PRNGKey(s))
        for i in np.asarray(ids1):
            counts[i] += 1
        for i in np.asarray(ids2):
            counts[i] += 1
    assert np.all(counts[np.asarray(descr["tokens_type"]) > 0] > 0)


def test_on_device_sampler_dataloader(tmp_path):
    """Full zero-host-data training via OnDeviceSamplerDataLoader +
    TrainerSiamese, from a features file + .classes + spkid."""
    from abnet3_tpu.dataloader import OnDeviceSamplerDataLoader
    from abnet3_tpu.io import write_h5features
    from abnet3_tpu.trainer import TrainerSiamese

    rng = np.random.RandomState(0)
    items = [f"f{i}" for i in range(4)]
    feats = [rng.randn(120, 5).astype(np.float32) for _ in items]
    times = [np.arange(120) * 0.01 + 0.0025 for _ in items]
    feats_path = str(tmp_path / "feats.h5f")
    write_h5features(feats_path, "features", items, times, feats)

    lines, tokid = [], 0
    for c in range(4):
        lines.append(f"{c} word{c}")
        for k in range(5):
            f = rng.randint(4)
            t0 = rng.randint(0, 90) * 0.01 + 0.0025
            t1 = t0 + rng.randint(5, 25) * 0.01
            lines.append(f"f{f} {t0:.4f} {t1:.4f}")
        lines.append("")
    classes_path = str(tmp_path / "w.classes")
    open(classes_path, "w").write("\n".join(lines) + "\n")
    spk_path = str(tmp_path / "spk.txt")
    open(spk_path, "w").write("f0 a\nf1 a\nf2 b\nf3 b\n")

    np.random.seed(0)
    dl = OnDeviceSamplerDataLoader(
        features_path=feats_path, std_file=classes_path,
        spkid_file=spk_path, batch_size=16, num_max_minibatches=4,
        max_size_cluster=0, seed=0)
    net = SiameseNetwork(input_dim=5, num_hidden_layers=1, hidden_dim=16,
                         output_dim=8, p_dropout=0.0,
                         activation_layer="sigmoid",
                         output_path=str(tmp_path / "net"))
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.01, num_epochs=3,
                             patience=5, log_dir=str(tmp_path / "logs"),
                             seed=0)
    trainer.train()
    assert len(trainer.train_losses) == 4
    assert all(np.isfinite(trainer.train_losses))
    # iterator access is an explicit error, not silent misuse
    with pytest.raises(TypeError):
        next(dl.batch_iterator())


def test_sampled_train_step_end_to_end(setup):
    """params, rng in -> loss out; nothing else crosses the boundary."""
    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=32)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=8, p_dropout=0.0,
                         activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_sampled_train_step(net, loss, opt, bank, sampler, mesh)
    losses = []
    for i in range(30):
        params, state, opt_state, value = step(
            params, state, opt_state, jax.random.PRNGKey(i))
        losses.append(float(value))
    assert all(np.isfinite(losses))
    # optimizes: average loss over the last 10 sampled batches is below
    # the first 10
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_sampled_eval_chaining_matches_single(setup):
    """K-chained sampled dev-eval dispatch == K single eval calls with
    the matching fold_in rng streams (round-2 weak #5)."""
    from abnet3_tpu.parallel import make_sampled_eval_step

    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=32)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=12,
                         output_dim=5, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    loss = coscos2()
    K = 3
    evalK = make_sampled_eval_step(net, loss, bank, sampler, mesh,
                                   steps_per_call=K)
    eval1 = make_sampled_eval_step(net, loss, bank, sampler, mesh)
    rng = jax.random.PRNGKey(7)
    chained = np.asarray(evalK(net.params, net.state, rng))
    assert chained.shape == (K,)
    singles = [float(eval1(net.params, net.state,
                           jax.random.fold_in(rng, k)))
               for k in range(K)]
    np.testing.assert_allclose(chained, singles, rtol=1e-6)


def test_sampler_speaker_labels(setup):
    """with_speakers=True emits the per-config same/diff-SPEAKER labels,
    consistent with the sampled tokens' actual speakers."""
    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=128)
    ids1, ids2, y, y_spk = sampler.sample(jax.random.PRNGKey(3),
                                          with_speakers=True)
    ids1, ids2, y_spk = map(np.asarray, (ids1, ids2, y_spk))
    spks = np.asarray(descr["tokens_speaker"])
    same = y_spk > 0
    np.testing.assert_array_equal(spks[ids1[same]], spks[ids2[same]])
    assert np.all(spks[ids1[~same]] != spks[ids2[~same]])


def test_sampled_multitask_train_and_eval(setup):
    """The fully on-device pipeline trains the multitask family: one
    jitted call samples pairs + speaker labels, aligns, and optimizes
    the weighted spk+phn loss; chained eval matches singles."""
    from abnet3_tpu.loss import cosmargin, weighted_loss_multi
    from abnet3_tpu.models import SiameseMultitaskNetwork
    from abnet3_tpu.parallel import make_sampled_eval_step

    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=24)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseMultitaskNetwork(
        input_dim=6, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=12, output_dim=5,
        p_dropout=0.0, activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = weighted_loss_multi(weight=0.4, loss_spk=coscos2(),
                               loss_phn=cosmargin(margin=0.3))
    opt = optax.adam(1e-3)
    step = make_sampled_train_step(net, loss, opt, bank, sampler, mesh,
                                   steps_per_call=2, extra_labels=True)
    p, s, o, v = step(params, state, opt.init(params),
                      jax.random.PRNGKey(1))
    assert np.isfinite(float(v))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(params),
                                jax.tree_util.tree_leaves(p)))
    assert moved

    K = 3
    evalK = make_sampled_eval_step(net, loss, bank, sampler, mesh,
                                   steps_per_call=K, extra_labels=True)
    eval1 = make_sampled_eval_step(net, loss, bank, sampler, mesh,
                                   extra_labels=True)
    rng = jax.random.PRNGKey(5)
    chained = np.asarray(evalK(params, state, rng))
    singles = [float(eval1(params, state, jax.random.fold_in(rng, k)))
               for k in range(K)]
    np.testing.assert_allclose(chained, singles, rtol=1e-6)


def test_on_device_sampler_multitask_trainer(tmp_path):
    """TrainerSiameseMultitask drives the fully on-device pipeline:
    sampling emits speaker labels, the step trains the weighted
    spk+phn loss (round-3: the sampled path covers the multitask
    family)."""
    from abnet3_tpu.dataloader import OnDeviceSamplerDataLoader
    from abnet3_tpu.io import write_h5features
    from abnet3_tpu.loss import cosmargin, weighted_loss_multi
    from abnet3_tpu.models import SiameseMultitaskNetwork
    from abnet3_tpu.trainer import TrainerSiameseMultitask

    rng = np.random.RandomState(0)
    items = [f"f{i}" for i in range(4)]
    feats = [rng.randn(120, 5).astype(np.float32) for _ in items]
    times = [np.arange(120) * 0.01 + 0.0025 for _ in items]
    feats_path = str(tmp_path / "feats.h5f")
    write_h5features(feats_path, "features", items, times, feats)
    lines = []
    for c in range(4):
        lines.append(f"{c} word{c}")
        for k in range(5):
            f = rng.randint(4)
            t0 = rng.randint(0, 90) * 0.01 + 0.0025
            t1 = t0 + rng.randint(5, 25) * 0.01
            lines.append(f"f{f} {t0:.4f} {t1:.4f}")
        lines.append("")
    classes_path = str(tmp_path / "w.classes")
    open(classes_path, "w").write("\n".join(lines) + "\n")
    spk_path = str(tmp_path / "spk.txt")
    open(spk_path, "w").write("f0 a\nf1 a\nf2 b\nf3 b\n")

    np.random.seed(0)
    dl = OnDeviceSamplerDataLoader(
        features_path=feats_path, std_file=classes_path,
        spkid_file=spk_path, batch_size=16, num_max_minibatches=4,
        max_size_cluster=0, seed=0, steps_per_call=2)
    net = SiameseMultitaskNetwork(
        input_dim=5, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=16, output_dim=8,
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "net"))
    loss = weighted_loss_multi(weight=0.5, loss_spk=coscos2(),
                               loss_phn=cosmargin(margin=0.3))
    trainer = TrainerSiameseMultitask(
        network=net, loss=loss, dataloader=dl, optimizer_type="adam",
        lr=0.01, num_epochs=2, patience=5,
        log_dir=str(tmp_path / "logs"), seed=0)
    trainer.train()
    assert len(trainer.train_losses) == 3
    assert all(np.isfinite(trainer.train_losses))
    assert all(np.isfinite(trainer.dev_losses))


def test_sampled_multitask_matrix_matches_gather(setup):
    """extra_labels gather branch (matrix off) gives the exact matrix-
    path loss — the same alignment contract the bank factories keep."""
    from abnet3_tpu.loss import cosmargin, weighted_loss_multi
    from abnet3_tpu.models import SiameseMultitaskNetwork
    from abnet3_tpu.parallel import make_sampled_eval_step

    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=24)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseMultitaskNetwork(
        input_dim=6, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=12, output_dim=5,
        p_dropout=0.0, activation_layer="sigmoid")
    net.ensure_init(0)
    loss = weighted_loss_multi(weight=0.4, loss_spk=coscos2(),
                               loss_phn=cosmargin(margin=0.3))
    ev_m = make_sampled_eval_step(net, loss, bank, sampler, mesh,
                                  extra_labels=True, matrix_loss=True)
    ev_g = make_sampled_eval_step(net, loss, bank, sampler, mesh,
                                  extra_labels=True, matrix_loss=False)
    for seed in (0, 1, 2):
        rng = jax.random.PRNGKey(seed)
        vm = float(ev_m(net.params, net.state, rng))
        vg = float(ev_g(net.params, net.state, rng))
        assert vm == pytest.approx(vg, rel=1e-5)


def test_zero_ratio_configs_get_no_leftovers(setup):
    """Int-truncation leftovers and unavailable-config top-ups must land
    on a config the user REQUESTED pairs of (review finding:
    ratio_same_diff_spk=1.0 — zero same-speaker pairs requested — still
    put a same-speaker pair in every batch)."""
    descr, proba, bank = setup
    sampler = DevicePairSampler(descr, proba, batch_size=10,
                                ratio_same_diff_spk=1.0,
                                ratio_same_diff_type=0.33)
    names = {c["name"]: c["n"] for c in sampler.configs}
    assert sum(names.values()) == 10  # static batch size holds
    assert "Stype_Sspk" not in names
    assert "Dtype_Sspk" not in names
    # degenerate tiny batch still samples (fallback to a viable config)
    s2 = DevicePairSampler(descr, proba, batch_size=1,
                           ratio_same_diff_spk=0.5,
                           ratio_same_diff_type=0.5)
    assert sum(c["n"] for c in s2.configs) == 1
