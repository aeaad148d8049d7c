"""Integration-unit tests + multimodal network/trainer end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abnet3_tpu.integration import (BiWeightedDeepLearnt, BiWeightedFixed,
                                    BiWeightedScalarLearnt,
                                    ConcatenationIntegration,
                                    MultitaskIntegration, SumIntegration)
from abnet3_tpu.models import MultimodalSiameseNetwork


def _inputs(n=6, d1=4, d2=4, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(n, d1).astype(np.float32)),
            jnp.asarray(rng.randn(n, d2).astype(np.float32))]


def test_concatenation():
    x = _inputs(d1=3, d2=5)
    unit = ConcatenationIntegration()
    out = unit.apply({}, x)
    assert out.shape == (6, 8)
    np.testing.assert_array_equal(np.asarray(out[:, :3]), np.asarray(x[0]))


def test_sum():
    x = _inputs()
    out = SumIntegration().apply({}, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x[0]) + np.asarray(x[1]))


def test_biweighted_fixed():
    x = _inputs()
    unit = BiWeightedFixed(integration_mode="sum", weight_value=0.3)
    out = unit.apply({}, x)
    np.testing.assert_allclose(
        np.asarray(out), 0.3 * np.asarray(x[0]) + 0.7 * np.asarray(x[1]),
        rtol=1e-6)
    unit_c = BiWeightedFixed(integration_mode="concat", weight_value=0.3)
    assert unit_c.apply({}, x).shape == (6, 8)
    with pytest.raises(AssertionError):
        BiWeightedFixed(weight_value=1.5)


def test_biweighted_scalar_learnt_headstart():
    x = _inputs()
    unit = BiWeightedScalarLearnt(integration_mode="sum", weight_value=0.5)
    params = unit.init_params(jax.random.PRNGKey(0))
    assert float(params["weight"][0]) == pytest.approx(0.5)
    # headstart: fixed weight, params ignored
    unit.set_headstart_weight(0.9)
    out = unit.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out), 0.9 * np.asarray(x[0]) + 0.1 * np.asarray(x[1]),
        rtol=1e-5)
    unit.start_training()
    out2 = unit.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out2), 0.5 * np.asarray(x[0]) + 0.5 * np.asarray(x[1]),
        rtol=1e-5)


def test_biweighted_deep_learnt():
    x = _inputs()
    unit = BiWeightedDeepLearnt(net_params=[[4, 8, 1], [4, 8, 1]],
                                activation_type="sigmoid",
                                integration_mode="sum")
    params = unit.init_params(jax.random.PRNGKey(0))
    out = unit.apply(params, x)
    assert out.shape == (6, 4)
    w = unit.get_weights(params)
    assert np.asarray(w).shape == (6, 1)
    assert np.all((np.asarray(w) > 0) & (np.asarray(w) < 1))  # sigmoid
    # gradient flows into the attention nets
    def f(p):
        return jnp.sum(unit.apply(p, x) ** 2)
    grads = jax.grad(f)(params)
    assert any(np.any(np.asarray(g) != 0)
               for g in jax.tree_util.tree_leaves(grads))
    # headstart freezes the weight path
    unit.set_headstart_weight(0.5)
    out_frozen = unit.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_frozen),
        0.5 * np.asarray(x[0]) + 0.5 * np.asarray(x[1]), rtol=1e-5)


def test_biweighted_pretrained_trimming(tmp_path):
    """trim_net* counts unrolled torch children like the reference
    (Linear, Dropout, activation per block, reference
    integration.py:539-566): trimmed and untrimmed give different
    attention inputs with the expected dimensions."""
    from abnet3_tpu.integration import BiWeightedPreTrained
    from abnet3_tpu.models import SiameseNetwork

    def make_net(seed):
        net = SiameseNetwork(input_dim=4, num_hidden_layers=1,
                             hidden_dim=6, output_dim=3, p_dropout=0.0,
                             activation_layer="sigmoid",
                             output_path=str(tmp_path / f"net{seed}"))
        net.ensure_init(seed)
        net.save_network()
        return net, str(tmp_path / f"net{seed}.pth")

    n1, p1 = make_net(0)
    n2, p2 = make_net(1)
    x = _inputs(d1=4, d2=4)

    # untrimmed: attention inputs are the towers' 3-dim outputs
    full = BiWeightedPreTrained(
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        p1, p2, net_params=[[3, 8, 1], [3, 8, 1]],
        activation_type="sigmoid", integration_mode="sum")
    params = full.init_params(jax.random.PRNGKey(2))
    out_full = full.apply(params, x)
    w_full = np.asarray(full.get_weights())

    # trim to blocks [0, 1]: attention inputs become the 6-dim hidden
    # activations -> the attention nets take 6-dim inputs
    trimmed = BiWeightedPreTrained(
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        # child index 5 = the full first two blocks (2 blocks x
        # [Linear, Dropout, activation]) -> 6-dim hidden activations
        p1, p2, trim_net1_end=5, trim_net2_end=5,
        net_params=[[6, 8, 1], [6, 8, 1]],
        activation_type="sigmoid", integration_mode="sum")
    params_t = trimmed.init_params(jax.random.PRNGKey(2))
    out_trim = trimmed.apply(params_t, x)
    w_trim = np.asarray(trimmed.get_weights())
    assert out_trim.shape == out_full.shape
    # same rng for the attention init but different attention inputs ->
    # different weights (trimming actually changed the computation)
    assert w_full.shape == w_trim.shape == (6, 1)
    assert not np.allclose(w_full, w_trim)

    # a mid-block end (child 3: second block's Linear only) strips the
    # second activation: output = W2 @ sigmoid(W1 x + b1) + b2
    import jax as _jax
    half = BiWeightedPreTrained(
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        p1, p2, trim_net1_end=3, trim_net2_end=3,
        net_params=[[6, 8, 1], [6, 8, 1]],
        activation_type="sigmoid", integration_mode="sum")
    got = np.asarray(half._run_pretrained(half._pre1, x[0],
                                          half._trim1))
    pr = n1.params
    h = _jax.nn.sigmoid(x[0] @ pr["layer_0"]["w"] + pr["layer_0"]["b"])
    want = np.asarray(h @ pr["layer_1"]["w"] + pr["layer_1"]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # a mid-block START (skipping a Linear) has no functional
    # equivalent and must refuse loudly
    bad = BiWeightedPreTrained(
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=6,
                       output_dim=3, p_dropout=0.0,
                       activation_layer="sigmoid"),
        p1, p2, trim_net1_start=1,
        net_params=[[3, 8, 1], [3, 8, 1]],
        activation_type="sigmoid", integration_mode="sum")
    with pytest.raises(AssertionError, match="inside a block"):
        bad._run_pretrained(bad._pre1, x[0], bad._trim1)

    # the trimmed sub-tower is numerically the prefix of the full tower:
    # block window [0,1] output feeds block [2,2] to reproduce the full net
    tower, tp, ts = n1._tower.sliced(n1.params, n1.state, None, 1)
    hidden, _ = tower.apply(tp, ts, x[0])
    assert hidden.shape == (6, 6)
    tail, tp2, ts2 = n1._tower.sliced(n1.params, n1.state, 2, None)
    reconstructed, _ = tail.apply(tp2, ts2, hidden)
    direct, _ = n1.forward_once(n1.params, n1.state, x[0], train=False)
    np.testing.assert_allclose(np.asarray(reconstructed),
                               np.asarray(direct), rtol=1e-6)


def test_multitask_integration_masks():
    unit = MultitaskIntegration(
        representation_modes=[(1, 0), (0, 1), (1, 1)],
        feed_modes="one2one", dimensions_list=[4, 4], batch_size=6)
    assert unit.feed_modes == [(0, 0), (1, 1), (2, 2)]
    x = _inputs()
    m1, m2 = unit.draw_masks(jax.random.PRNGKey(0), 6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))  # one2one
    out = unit.apply({}, x, rng=jax.random.PRNGKey(0), train=True)
    assert out.shape == (6, 8)
    # embedding mode (no rng): all modalities pass through
    out_emb = unit.apply({}, x)
    np.testing.assert_allclose(
        np.asarray(out_emb),
        np.concatenate([np.asarray(x[0]), np.asarray(x[1])], 1))
    # many2many expands to the full product
    unit2 = MultitaskIntegration(
        representation_modes=[(1, 0), (0, 1)], feed_modes="many2many",
        dimensions_list=[4, 4], batch_size=6)
    assert len(unit2.feed_modes) == 4


def test_multimodal_network_forward_and_grads():
    unit = BiWeightedDeepLearnt(net_params=[[6, 1], [6, 1]],
                                integration_mode="sum")
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x1 = [jnp.asarray(rng.randn(6, 4).astype(np.float32)),
          jnp.asarray(rng.randn(6, 5).astype(np.float32))]
    x2 = [jnp.asarray(rng.randn(6, 4).astype(np.float32)),
          jnp.asarray(rng.randn(6, 5).astype(np.float32))]
    e1, e2, _ = net.forward(params, state, x1, x2, train=False)
    assert e1.shape == (6, 3)

    from abnet3_tpu.loss import coscos2
    y = jnp.asarray(rng.choice([1.0, -1.0], 6).astype(np.float32))

    def f(p):
        a, b, _ = net.forward(p, state, x1, x2, train=True)
        return coscos2()(a, b, y)

    grads = jax.grad(f)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.any(np.asarray(g) != 0), f"zero grad at {path}"


def test_multimodal_asynchronous_attention():
    """Attention inputs taken from an earlier pre-net layer
    (reference model.py:550-558)."""
    unit = BiWeightedDeepLearnt(net_params=[[4, 1], [5, 1]],
                                integration_mode="sum")
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        asynchronous_integration_index=0,
        p_dropout=0.0, activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = [jnp.asarray(rng.randn(6, 4).astype(np.float32)),
         jnp.asarray(rng.randn(6, 5).astype(np.float32))]
    out, _ = net.forward_once(params, state, x, train=False)
    assert out.shape == (6, 3)


def test_multimodal_embedder_chunked_matches_eager(tmp_path):
    """Files longer than batch_size embed through fixed-size padded
    chunks, compile ONCE, and match the eager per-file forward exactly;
    attention weights come from the returned arrays."""
    from abnet3_tpu.embedder import MultimodalEmbedder
    from abnet3_tpu.io import read_h5features, write_h5features

    rng = np.random.RandomState(0)
    items = ["a", "b", "c"]
    lengths = [50, 33, 7]  # 50 and 33 exceed batch_size=16
    paths, all_feats = [], []
    for m, d in enumerate((4, 5)):
        p = str(tmp_path / f"m{m}.h5f")
        feats = [rng.randn(n, d).astype(np.float32) for n in lengths]
        times = [np.arange(n) * 0.01 + 0.0025 for n in lengths]
        write_h5features(p, "features", items, times, feats)
        paths.append(p)
        all_feats.append(feats)

    unit = BiWeightedDeepLearnt(net_params=[[6, 1], [6, 1]],
                                integration_mode="sum")
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "net"))
    net.ensure_init(0)
    net.save_network()

    emb = MultimodalEmbedder(network=net, feature_path=paths,
                             network_path=str(tmp_path / "net.pth"),
                             output_path=str(tmp_path / "out"),
                             batch_size=16)
    emb.embed()
    data = read_h5features(str(tmp_path / "out") + "embedded.features")
    att = read_h5features(
        str(tmp_path / "out") + "attention_weights.features")

    for i, n in enumerate(lengths):
        x_list = [jnp.asarray(all_feats[m][i]) for m in range(2)]
        eager, _ = net.forward_once(net.params, net.state, x_list,
                                    train=False)
        np.testing.assert_allclose(data.features()[i], np.asarray(eager),
                                   rtol=1e-5, atol=1e-6)
        w_eager = np.asarray(unit.get_weights())
        assert att.features()[i].shape == (n, 1)
        np.testing.assert_allclose(att.features()[i], w_eager[:n],
                                   rtol=1e-5, atol=1e-6)


def test_multimodal_embedder_compiles_once(tmp_path, monkeypatch):
    """Ragged files all route through ONE compiled chunk shape."""
    from abnet3_tpu.embedder import MultimodalEmbedder
    from abnet3_tpu.io import write_h5features

    rng = np.random.RandomState(0)
    items = ["a", "b", "c", "d"]
    lengths = [40, 17, 9, 25]
    paths = []
    for m, d in enumerate((4, 5)):
        p = str(tmp_path / f"m{m}.h5f")
        feats = [rng.randn(n, d).astype(np.float32) for n in lengths]
        times = [np.arange(n) * 0.01 + 0.0025 for n in lengths]
        write_h5features(p, "features", items, times, feats)
        paths.append(p)

    unit = BiWeightedDeepLearnt(net_params=[[6, 1], [6, 1]],
                                integration_mode="sum")
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid")
    net.ensure_init(0)

    # forward_once only runs at trace time inside the jitted chunk
    # forward: one call == one compilation for the whole ragged corpus
    calls = {"n": 0}
    orig_forward = MultimodalSiameseNetwork.forward_once

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig_forward(self, *a, **k)

    monkeypatch.setattr(MultimodalSiameseNetwork, "forward_once", counting)
    emb = MultimodalEmbedder(network=net, feature_path=paths,
                             output_path=str(tmp_path / "out"),
                             batch_size=16)
    emb.embed()
    assert calls["n"] == 1
    """MultimodalDataLoader + MultimodalTrainer + MultimodalEmbedder."""
    import os
    from abnet3_tpu.dataloader import MultimodalDataLoader
    from abnet3_tpu.embedder import MultimodalEmbedder
    from abnet3_tpu.io import read_h5features, write_h5features
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.trainer import MultimodalTrainer

    rng = np.random.RandomState(0)
    items = [f"f{i}" for i in range(4)]
    paths = []
    for m, d in enumerate((4, 5)):
        p = str(tmp_path / f"feats{m}.h5f")
        feats = [rng.randn(80, d).astype(np.float32) for _ in items]
        times = [np.arange(80) * 0.01 + 0.0025 for _ in items]
        write_h5features(p, "features", items, times, feats)
        paths.append(p)

    def tok(i, a, b):
        return f"f{i} {a:.2f} {b:.2f}"

    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write(f"{tok(0, 0.0, 0.12)} {tok(1, 0.3, 0.39)} same\n"
                f"{tok(2, 0.3, 0.5)} {tok(3, 0.0, 0.08)} diff\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write(f"{tok(0, 0.1, 0.2)} {tok(2, 0.4, 0.52)} same\n")

    unit = BiWeightedDeepLearnt(net_params=[[6, 1], [6, 1]],
                                integration_mode="sum",
                                output_path=str(tmp_path / "int"))
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "net"))
    dl = MultimodalDataLoader(pairs_path, paths, batch_size=8)
    trainer = MultimodalTrainer(network=net, loss=coscos2(), dataloader=dl,
                                optimizer_type="adam", lr=0.01,
                                num_epochs=2, patience=3,
                                log_dir=str(tmp_path / "logs"), seed=0,
                                headstart=(1, True, 0.5))
    trainer.train()
    assert len(trainer.train_losses) >= 2
    assert all(np.isfinite(trainer.train_losses))

    emb = MultimodalEmbedder(network=net, feature_path=paths,
                             output_path=str(tmp_path / "emb"),
                             batch_size=64)
    emb.embed()
    data = read_h5features(str(tmp_path / "emb") + "embedded.features")
    assert data.items() == items
    assert data.features()[0].shape == (80, 3)
    # attention-weight observer dump
    att = read_h5features(
        str(tmp_path / "emb") + "attention_weights.features")
    assert att.features()[0].shape == (80, 1)


def test_multimodal_embedder_aligns_modalities_by_item(tmp_path):
    """Modality feature files whose items are stored in different orders
    must join BY ITEM NAME (review finding: a positional zip silently
    paired modality-1 of one utterance with modality-2 of another when
    files were regenerated with different enumeration orders)."""
    from abnet3_tpu.embedder import MultimodalEmbedder
    from abnet3_tpu.io import read_h5features, write_h5features

    rng = np.random.RandomState(0)
    items = ["a", "b", "c"]
    lengths = {"a": 9, "b": 12, "c": 7}
    per_item = {m: {it: rng.randn(lengths[it], d).astype(np.float32)
                    for it in items}
                for m, d in enumerate((4, 5))}
    paths = []
    for m, order in enumerate((items, ["c", "a", "b"])):  # scrambled m1
        p = str(tmp_path / f"m{m}.h5f")
        write_h5features(
            p, "features", list(order),
            [np.arange(lengths[it]) * 0.01 + 0.0025 for it in order],
            [per_item[m][it] for it in order])
        paths.append(p)

    unit = BiWeightedFixed(weight_value=0.5)
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "net"))
    net.ensure_init(0)
    net.save_network()

    emb = MultimodalEmbedder(network=net, feature_path=paths,
                             network_path=str(tmp_path / "net.pth"),
                             output_path=str(tmp_path / "out"),
                             batch_size=16)
    emb.embed()
    data = read_h5features(str(tmp_path / "out") + "embedded.features")
    assert data.items() == items
    for i, it in enumerate(items):
        x_list = [jnp.asarray(per_item[m][it]) for m in range(2)]
        eager, _ = net.forward_once(net.params, net.state, x_list,
                                    train=False)
        np.testing.assert_allclose(data.features()[i], np.asarray(eager),
                                   rtol=1e-5, atol=1e-6)

    # an item missing from a modality file is a clear KeyError, not a
    # silent mispairing or a late length-assert
    p_bad = str(tmp_path / "m1_short.h5f")
    write_h5features(p_bad, "features", ["a", "b"],
                     [np.arange(lengths[it]) * 0.01 + 0.0025
                      for it in ("a", "b")],
                     [per_item[1][it] for it in ("a", "b")])
    emb_bad = MultimodalEmbedder(network=net,
                                 feature_path=[paths[0], p_bad],
                                 network_path=str(tmp_path / "net.pth"),
                                 output_path=str(tmp_path / "out2"),
                                 batch_size=16)
    with pytest.raises(KeyError):
        emb_bad.embed()


def test_multimodal_resume_after_headstart_with_prewarm(tmp_path,
                                                        monkeypatch):
    """Resuming a post-headstart checkpoint with compile prewarm on must
    restore BEFORE warming (review finding: train() prewarmed first, so
    _ensure_frame_steps cached step closures built with the pre-restore
    unfrozen optimizer; the restored frozen-main opt_state then
    mismatched the cached closure at the first real dispatch)."""
    import os
    from abnet3_tpu.dataloader import MultimodalDataLoader
    from abnet3_tpu.io import write_h5features
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.trainer import MultimodalTrainer

    monkeypatch.setenv("ABNET3_TRAIN_PREWARM", "1")
    rng = np.random.RandomState(0)
    items = [f"f{i}" for i in range(4)]
    paths = []
    for m, d in enumerate((4, 5)):
        p = str(tmp_path / f"feats{m}.h5f")
        feats = [rng.randn(80, d).astype(np.float32) for _ in items]
        times = [np.arange(80) * 0.01 + 0.0025 for _ in items]
        write_h5features(p, "features", items, times, feats)
        paths.append(p)

    def tok(i, a, b):
        return f"f{i} {a:.2f} {b:.2f}"

    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write(f"{tok(0, 0.0, 0.12)} {tok(1, 0.3, 0.39)} same\n"
                f"{tok(2, 0.3, 0.5)} {tok(3, 0.0, 0.08)} diff\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write(f"{tok(0, 0.1, 0.2)} {tok(2, 0.4, 0.52)} same\n")

    def build(outdir):
        unit = BiWeightedDeepLearnt(net_params=[[6, 1], [6, 1]],
                                    integration_mode="sum",
                                    output_path=str(outdir / "int"))
        net = MultimodalSiameseNetwork(
            integration_unit=unit,
            pre_integration_net_params=[[4, 6], [5, 6]],
            post_integration_net_params=[6, 3],
            p_dropout=0.0, activation_layer="sigmoid",
            output_path=str(outdir / "net"))
        dl = MultimodalDataLoader(pairs_path, paths, batch_size=8,
                                  steps_per_call=2)
        return MultimodalTrainer(network=net, loss=coscos2(),
                                 dataloader=dl, optimizer_type="adam",
                                 lr=0.01, num_epochs=3, patience=5,
                                 log_dir=str(outdir / "logs"), seed=0,
                                 headstart=(1, False, 0.5))

    d = tmp_path / "run"
    d.mkdir()
    tr = build(d)
    tr.train()  # headstart ends mid-run -> _frozen_main True, ckpt saved
    assert getattr(tr, "_frozen_main", False)

    tr2 = build(d)
    tr2.num_epochs = 5
    tr2.train(resume=True)  # prewarm must run with the RESTORED config
    assert getattr(tr2, "_frozen_main", False)
    assert len(tr2.train_losses) >= 4
    assert all(np.isfinite(tr2.train_losses))
