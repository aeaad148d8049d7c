"""Bank-ified secondary loaders (round-2 weak #4).

Frames/Multimodal/TemporalCoherence loaders keep their frame corpora
device-resident (dataloader.frame_tables) and yield int32 index batches
(FrameBankBatch) consumed by an index-gather step
(parallel.make_frame_train_step) — no per-batch feature h2d. The host
parity path survives under align_backend='host'.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from abnet3_tpu.dataloader import (Batch, FrameBankBatch, FramesDataLoader,
                                   MultimodalDataLoader,
                                   TemporalCoherenceDataLoader)
from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.parallel import make_frame_train_step, make_mesh

from test_dataloader import corpus  # noqa: F401


def _mk(loader_cls, corpus, **kw):
    feats_path, pairs_path, _ = corpus
    dl = loader_cls(pairs_path, feats_path, **kw)
    # pin the frame-pair shuffle (load_all_frames shuffles with the
    # loader rng, which is unseeded by default) so host/device loaders
    # build identical frame-pair orders
    dl._rng = np.random.RandomState(0)
    return dl


def test_frames_device_batches_match_host(corpus):
    """Device index batches gather EXACTLY the host path's frame rows
    (same seed, shuffling off)."""
    dl_dev = _mk(FramesDataLoader, corpus, batch_size=10,
                 randomize_dataset=False, align_backend="device")
    dl_host = _mk(FramesDataLoader, corpus, batch_size=10,
                  randomize_dataset=False, align_backend="host")
    dev_batches = list(dl_dev.batch_iterator(True))
    host_batches = list(dl_host.batch_iterator(True))
    assert dev_batches and len(dev_batches) == len(host_batches)
    table = np.asarray(dl_dev.frame_tables(True)[0])
    for bd, bh in zip(dev_batches, host_batches):
        assert isinstance(bd, FrameBankBatch) and isinstance(bh, Batch)
        n = int(bd.weights.sum())
        np.testing.assert_array_equal(table[bd.i1[:n]],
                                      np.asarray(bh.x1))
        np.testing.assert_array_equal(table[bd.i2[:n]],
                                      np.asarray(bh.x2))
        np.testing.assert_array_equal(bd.y[:n], np.asarray(bh.y))


def test_frames_ragged_tail_pads_static(corpus):
    """Index batches keep a static shape: the ragged tail pads with
    weight 0, so one step variant compiles per mode."""
    dl = _mk(FramesDataLoader, corpus, batch_size=64,
             randomize_dataset=False)
    shapes = set()
    total_valid = 0
    for b in dl.batch_iterator(True):
        shapes.add(b.i1.shape)
        total_valid += int(b.weights.sum())
    assert len(shapes) == 1
    assert total_valid <= len(dl.frame_pairs["train"])


def test_frame_step_matches_direct_loss(corpus):
    """The index-gather eval step equals the loss on host-gathered rows;
    the chained train step equals K single steps."""
    dl = _mk(FramesDataLoader, corpus, batch_size=12,
             randomize_dataset=False)
    batches = list(dl.batch_iterator(True))[:3]
    assert len(batches) == 3
    tables = dl.frame_tables(True)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=8,
                         output_dim=4, p_dropout=0.0,
                         activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    opt = optax.adam(1e-3)

    train1, eval1 = make_frame_train_step(net, loss, opt, tables, mesh)
    table = np.asarray(tables[0])
    for b in batches:
        got = float(eval1(params, state, b.i1, b.i2, b.y, b.weights))
        e1, _ = net.forward_once(params, state, table[b.i1], train=False)
        e2, _ = net.forward_once(params, state, table[b.i2], train=False)
        want = float(loss(e1, e2, jnp.asarray(b.y),
                          weights=jnp.asarray(b.weights)))
        assert got == pytest.approx(want, rel=1e-6)

    # K-chained == unchained
    K = 3
    p1, s1, o1 = params, state, opt.init(params)
    rng = jax.random.PRNGKey(2)
    for k, b in enumerate(batches):
        p1, s1, o1, _ = train1(p1, s1, o1, jax.random.fold_in(rng, k),
                               b.i1, b.i2, b.y, b.weights)
    trainK, evalK = make_frame_train_step(net, loss, opt, tables, mesh,
                                          steps_per_call=K)
    stacked = tuple(np.stack([np.asarray(getattr(b, f))
                              for b in batches])
                    for f in ("i1", "i2", "y", "weights"))
    pK, sK, oK, _ = trainK(params, state, opt.init(params), rng, *stacked)
    for a, b_ in zip(jax.tree_util.tree_leaves(p1),
                     jax.tree_util.tree_leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-7)
    values = np.asarray(evalK(params, state, *stacked))
    assert values.shape == (K,)


def test_frames_trainer_end_to_end(corpus):
    """TrainerSiamese drives the index-batch path (buffered chained
    dispatches + flush) through two epochs."""
    from abnet3_tpu.trainer import TrainerSiamese
    import tempfile
    dl = _mk(FramesDataLoader, corpus, batch_size=16,
             randomize_dataset=False, steps_per_call=2)
    with tempfile.TemporaryDirectory() as td:
        net = SiameseNetwork(input_dim=4, num_hidden_layers=1,
                             hidden_dim=8, output_dim=4, p_dropout=0.0,
                             activation_layer="sigmoid",
                             output_path=td + "/net")
        tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                            num_epochs=2, patience=5, lr=1e-3,
                            optimizer_type="adam", log_dir=td)
        tr.train()
    assert len(tr.train_losses) == 3  # epoch-0 eval + 2 epochs
    assert all(np.isfinite(v) for v in tr.train_losses)
    assert all(np.isfinite(v) for v in tr.dev_losses)


def test_tcl_loader_device_batches(corpus):
    """TemporalCoherence train batches become static index groups into
    the device frame bank with reference delta structure."""
    dl = _mk(TemporalCoherenceDataLoader, corpus, batch_size=40,
             num_max_minibatches=5)
    batches = list(dl.batch_iterator(True))
    assert len(batches) == 5
    bank = np.asarray(dl.frame_tables(True)[0])
    sizes = set()
    for b in batches:
        assert isinstance(b, FrameBankBatch)
        sizes.add(len(b.i1))
        deltas = np.asarray(b.i2) - np.asarray(b.i1)
        y = np.asarray(b.y)
        assert set(deltas[y > 0]) <= {1}
        assert set(deltas[y < 0]) <= {15, 20, 25, 30}
        assert (np.asarray(b.i2) < len(bank)).all()
    assert len(sizes) == 1  # static group -> one compiled variant
    # host parity path survives
    dl_host = _mk(TemporalCoherenceDataLoader, corpus, batch_size=40,
                  num_max_minibatches=2, align_backend="host")
    for b in dl_host.batch_iterator(True):
        assert isinstance(b, Batch)


def test_multimodal_device_batches_match_host(corpus):
    """Multimodal index batches gather the host path's per-modality
    rows exactly; only ~KB of indices cross the host-device seam."""
    feats_path, pairs_path, _ = corpus
    dl_dev = MultimodalDataLoader(pairs_path, [feats_path, feats_path],
                                  batch_size=20,
                                  randomize_dataset=False)
    dl_dev._rng = np.random.RandomState(0)
    dl_host = MultimodalDataLoader(pairs_path, [feats_path, feats_path],
                                   batch_size=20,
                                   randomize_dataset=False,
                                   align_backend="host")
    dl_host._rng = np.random.RandomState(0)
    dev_batches = list(dl_dev.batch_iterator(True))
    host_batches = list(dl_host.batch_iterator(True))
    assert dev_batches and len(dev_batches) == len(host_batches)
    tables = [np.asarray(t) for t in dl_dev.frame_tables(True)]
    assert len(tables) == 2
    for bd, bh in zip(dev_batches, host_batches):
        assert isinstance(bd, FrameBankBatch)
        n = int(bd.weights.sum())
        for m, t in enumerate(tables):
            np.testing.assert_array_equal(t[bd.i1[:n]],
                                          np.asarray(bh.x1[m]))
            np.testing.assert_array_equal(t[bd.i2[:n]],
                                          np.asarray(bh.x2[m]))


def test_multimodal_trainer_frame_bank(corpus):
    """MultimodalTrainer drives the multimodal index-batch path."""
    import tempfile
    from abnet3_tpu.integration import ConcatenationIntegration
    from abnet3_tpu.models import MultimodalSiameseNetwork
    from abnet3_tpu.trainer import MultimodalTrainer

    feats_path, pairs_path, _ = corpus
    dl = MultimodalDataLoader(pairs_path, [feats_path, feats_path],
                              batch_size=16, randomize_dataset=False,
                              steps_per_call=2)
    with tempfile.TemporaryDirectory() as td:
        net = MultimodalSiameseNetwork(
            integration_unit=ConcatenationIntegration(),
            pre_integration_net_params=[[4, 8], [4, 8]],
            post_integration_net_params=[16, 4],
            p_dropout=0.0, activation_layer="sigmoid",
            output_path=td + "/net")
        tr = MultimodalTrainer(network=net, loss=coscos2(),
                               dataloader=dl, num_epochs=1, patience=3,
                               lr=1e-3, optimizer_type="adam",
                               log_dir=td)
        tr.train()
    assert all(np.isfinite(v) for v in tr.train_losses)


def test_tcl_loader_bank_backend_dev_pass(corpus):
    """Review regression: a TemporalCoherenceDataLoader on the bank
    backend builds a frame bank (for its own train batches) while
    tcl == 0 — the dev pass routes through the bank iterator, which
    must NOT attach a tcl group (gate on tcl, not frame_bank)."""
    import tempfile
    from abnet3_tpu.trainer import TrainerSiamese
    dl = _mk(TemporalCoherenceDataLoader, corpus, batch_size=20,
             num_max_minibatches=2, align_backend="bank")
    train_batches = list(dl.batch_iterator(True))  # builds frame_bank
    assert dl.frame_bank is not None and dl.tcl == 0.0
    dev_batches = list(dl.batch_iterator(False))
    assert dev_batches
    for b in dev_batches:
        assert getattr(b, "tcl_i1", None) is None
    with tempfile.TemporaryDirectory() as td:
        net = SiameseNetwork(input_dim=4, num_hidden_layers=1,
                             hidden_dim=8, output_dim=4, p_dropout=0.0,
                             activation_layer="sigmoid",
                             output_path=td + "/net")
        tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                            num_epochs=1, patience=3, lr=1e-3,
                            optimizer_type="adam", log_dir=td)
        tr.train()  # crashed before the fix (scalar anchors -> iter)
    assert all(np.isfinite(v) for v in tr.dev_losses)


def test_multimodal_single_modality_frame_bank(corpus):
    """Review regression: a ONE-modality MultimodalDataLoader must still
    take the multimodal step (x lists), not the array-path — the flag
    comes from the loader type, not the table count."""
    import tempfile
    from abnet3_tpu.integration import ConcatenationIntegration
    from abnet3_tpu.models import MultimodalSiameseNetwork
    from abnet3_tpu.trainer import MultimodalTrainer

    feats_path, pairs_path, _ = corpus
    dl = MultimodalDataLoader(pairs_path, [feats_path], batch_size=16,
                              randomize_dataset=False, steps_per_call=2)
    dl._rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        net = MultimodalSiameseNetwork(
            integration_unit=ConcatenationIntegration(),
            pre_integration_net_params=[[4, 8]],
            post_integration_net_params=[8, 4],
            p_dropout=0.0, activation_layer="sigmoid",
            output_path=td + "/net")
        tr = MultimodalTrainer(network=net, loss=coscos2(),
                               dataloader=dl, num_epochs=1, patience=3,
                               lr=1e-3, optimizer_type="adam",
                               log_dir=td)
        tr.train()  # TypeError'd before the fix
    assert all(np.isfinite(v) for v in tr.train_losses)
