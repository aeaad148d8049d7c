"""Regression tests for the round-1 code-review findings."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abnet3_tpu.models import (MultimodalSiameseNetwork,
                               SiameseMultitaskNetwork, SiameseNetwork)

from test_dataloader import corpus  # noqa: F401


def test_multitask_save_load_roundtrip(tmp_path):
    """Empty batch-norm state dicts must survive serialization
    (finding 1: _flatten used to drop empty subtrees -> KeyError)."""
    net = SiameseMultitaskNetwork(
        input_dim=6, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=8, output_dim=4, p_dropout=0.0,
        activation_layer="relu", output_path=str(tmp_path / "net"))
    net.ensure_init(0)
    assert sorted(net.state.keys()) == ["phn", "spk", "trunk"]
    net.save_network()

    net2 = SiameseMultitaskNetwork(
        input_dim=6, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=8, output_dim=4, p_dropout=0.0,
        activation_layer="relu")
    net2.load_network(str(tmp_path / "net.pth"))
    assert sorted(net2.state.keys()) == ["phn", "spk", "trunk"]
    x = jnp.asarray(np.random.RandomState(0).randn(4, 6).astype(np.float32))
    spk, phn, _ = net2.forward_once(net2.params, net2.state, x)
    assert spk.shape == (4, 4)


def test_dataloader_pickle_roundtrip(corpus):  # noqa: F811
    """Finding 3: __setstate__ must work for subclasses and preserve
    non-default options."""
    from abnet3_tpu.dataloader import (FramesDataLoader, MultiTaskDataLoader,
                                       OriginalDataLoader)
    feats_path, pairs_path, spk_path = corpus

    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=5,
                            num_max_minibatches=7, seed=3, tcl=0.3,
                            align_different_words=True,
                            align_backend="host")
    dl.load_data()
    dl2 = pickle.loads(pickle.dumps(dl))
    assert dl2.tcl == 0.3
    assert dl2.align_different_words is True
    assert dl2.batch_size == 5 and dl2.num_max_minibatches == 7
    assert dl2.features is not None  # reloaded

    mt = MultiTaskDataLoader(pairs_path, feats_path, fid2spk_file=spk_path,
                             batch_size=4)
    mt.load_data()
    mt2 = pickle.loads(pickle.dumps(mt))
    assert mt2.fid2spk_file == spk_path

    fr = FramesDataLoader(pairs_path, feats_path, batch_size=16)
    fr.load_data()
    fr2 = pickle.loads(pickle.dumps(fr))
    assert fr2.batch_size == 16
    # heavy caches reloaded lazily by load_data
    assert fr2.frame_pairs["train"] is not None


def test_weighted_batchnorm_excludes_padding():
    """Finding 5: BN train statistics must ignore weight-0 rows."""
    net = SiameseNetwork(input_dim=4, num_hidden_layers=0, hidden_dim=8,
                         output_dim=4, p_dropout=0.0, batch_norm=True,
                         activation_layer="relu")
    params, state = net.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x1 = rng.randn(10, 4).astype(np.float32)
    x2 = rng.randn(10, 4).astype(np.float32)
    pad = np.zeros((6, 4), np.float32)
    x1p = np.vstack([x1, pad])
    x2p = np.vstack([x2, pad])
    w = np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32)

    _, _, st_clean = net.forward(params, state, jnp.asarray(x1),
                                 jnp.asarray(x2), train=True)
    _, _, st_padded = net.forward(params, state, jnp.asarray(x1p),
                                  jnp.asarray(x2p), train=True,
                                  weights=jnp.asarray(w))
    for k in st_clean:
        np.testing.assert_allclose(np.asarray(st_clean[k]["mean"]),
                                   np.asarray(st_padded[k]["mean"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_clean[k]["var"]),
                                   np.asarray(st_padded[k]["var"]),
                                   rtol=1e-4)


def test_tcl_dev_batch_size():
    """Finding 8: dev fallback must use test_words_batch_size."""
    from abnet3_tpu.dataloader import TemporalCoherenceDataLoader
    dl = TemporalCoherenceDataLoader("p", "f", batch_size=500,
                                     test_words_batch_size=32)
    assert dl.test_words_batch_size == 32
    assert dl.batch_size == 500


def test_multimodal_gridsearch_roundtrip(tmp_path):
    """Finding 9: trainer save + embedder load must agree on paths."""
    from abnet3_tpu.integration import SumIntegration
    unit = SumIntegration(output_path=str(tmp_path / "int"))
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "network"))
    net.ensure_init(0)
    net.save_network()
    # the orchestrator wires network_path = output_path + '.pth'
    assert os.path.exists(str(tmp_path / "network.pth"))
    net2 = MultimodalSiameseNetwork(
        integration_unit=SumIntegration(),
        pre_integration_net_params=[[4, 6], [5, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid")
    net2.load_network(str(tmp_path / "network.pth"))
    rng = np.random.RandomState(0)
    x = [jnp.asarray(rng.randn(3, 4).astype(np.float32)),
         jnp.asarray(rng.randn(3, 5).astype(np.float32))]
    a, _ = net.forward_once(net.params, net.state, x)
    b, _ = net2.forward_once(net2.params, net2.state, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_headstart_freezes_main_network(tmp_path):
    """Finding 2: after a non-parallel headstart ends, only the
    integration/attention params may keep moving."""
    from abnet3_tpu.dataloader import MultimodalDataLoader
    from abnet3_tpu.integration import BiWeightedScalarLearnt
    from abnet3_tpu.io import write_h5features
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.trainer import MultimodalTrainer

    rng = np.random.RandomState(0)
    items = [f"f{i}" for i in range(3)]
    paths = []
    for m, d in enumerate((4, 4)):
        p = str(tmp_path / f"feats{m}.h5f")
        feats = [rng.randn(60, d).astype(np.float32) for _ in items]
        times = [np.arange(60) * 0.01 + 0.0025 for _ in items]
        write_h5features(p, "features", items, times, feats)
        paths.append(p)
    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write("f0 0.00 0.12 f1 0.30 0.39 same\n"
                "f2 0.30 0.50 f0 0.60 0.68 diff\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write("f0 0.10 0.20 f2 0.40 0.52 same\n")

    unit = BiWeightedScalarLearnt(integration_mode="sum", weight_value=0.5,
                                  output_path=str(tmp_path / "int"))
    net = MultimodalSiameseNetwork(
        integration_unit=unit,
        pre_integration_net_params=[[4, 6], [4, 6]],
        post_integration_net_params=[6, 3],
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "net"))
    dl = MultimodalDataLoader(pairs_path, paths, batch_size=8)
    # headstart ends after 1 epoch and the main net must then freeze
    trainer = MultimodalTrainer(network=net, loss=coscos2(), dataloader=dl,
                                optimizer_type="adam", lr=0.05,
                                num_epochs=4, patience=10,
                                log_dir=str(tmp_path / "logs"), seed=0,
                                headstart=(1, False, 0.5))
    trainer.train()
    assert trainer._frozen_main is True
    # run two more manual epochs and check main params are static
    main_before = jax.tree_util.tree_leaves(
        {k: v for k, v in net.params.items() if k != "integration"})
    att_before = np.asarray(net.params["integration"]["weight"]).copy()
    trainer.optimize_model(do_training=True)
    main_after = jax.tree_util.tree_leaves(
        {k: v for k, v in net.params.items() if k != "integration"})
    att_after = np.asarray(net.params["integration"]["weight"])
    for a, b in zip(main_before, main_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(att_before, att_after)
