"""Trainer tests: jitted step correctness, epoch loop, optimizer zoo."""

import os
import pickle
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abnet3_tpu.dataloader import Batch, MultiTaskDataLoader, \
    OriginalDataLoader
from abnet3_tpu.loss import coscos2, cosmargin, weighted_loss_multi
from abnet3_tpu.models import SiameseMultitaskNetwork, SiameseNetwork
from abnet3_tpu.trainer import (TrainerSiamese, TrainerSiameseMultitask,
                                build_optimizer)

from test_dataloader import corpus  # noqa: F401  (fixture reuse)


def _network(tmp_path, **kw):
    cfg = dict(input_dim=4, num_hidden_layers=1, hidden_dim=16,
               output_dim=8, p_dropout=0.0, activation_layer="sigmoid",
               output_path=str(tmp_path / "network"))
    cfg.update(kw)
    return SiameseNetwork(**cfg)


@pytest.mark.parametrize("opt", ["sgd", "adadelta", "adam", "adagrad",
                                 "RMSprop", "LBFGS"])
def test_optimizer_zoo_steps(opt):
    """Every optimizer type must produce a working update through the
    closure-mode update helper the step factories use (LBFGS's zoom
    linesearch consumes the extra args; the rest ignore them)."""
    import optax
    from abnet3_tpu.parallel.mesh import opt_update
    tx = build_optimizer(opt, 0.01)
    p = {"w": jnp.ones((4, 4))}
    s = tx.init(p)

    def f(q):
        return jnp.sum((q["w"] - 0.5) ** 2)

    v, g = jax.value_and_grad(f)(p)
    u, s = opt_update(tx, g, s, p, v, f)
    p2 = optax.apply_updates(p, u)
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(p["w"]))


def test_lbfgs_converges_through_train_loop(corpus, tmp_path):  # noqa: F811
    """The reference exposes closure-mode LBFGS (reference
    trainer.py:68-87); ours must actually CONVERGE through the real
    trainer loop, not just step (round-2 weak #7: linesearch=None was a
    semantically different optimizer — measured flat at chance loss)."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=1, seed=0,
                            shuffle_between_epochs=False)
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="LBFGS", lr=1.0,
                             num_epochs=8, patience=10,
                             log_dir=str(tmp_path / "logs"), seed=0)
    trainer.train()
    assert all(np.isfinite(trainer.train_losses))
    # epoch 0 is the eval-only baseline; training must clearly beat it
    assert trainer.train_losses[-1] < 0.8 * trainer.train_losses[0]


def test_train_loop_runs_and_saves(corpus, tmp_path):  # noqa: F811
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=3,
                            num_max_minibatches=2, seed=0)
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.01, num_epochs=3,
                             patience=5, log_dir=str(tmp_path / "logs"),
                             seed=0)
    trainer.train()
    # epoch-0 eval + 3 epochs
    assert len(trainer.train_losses) == 4
    assert all(np.isfinite(trainer.train_losses))
    # artifacts: best network + whoami params pickle
    assert os.path.exists(str(tmp_path / "network.pth"))
    with open(str(tmp_path / "network.params"), "rb") as fh:
        whoami = pickle.load(fh)
    assert whoami["class_name"] == "TrainerSiamese"
    assert whoami["network"]["class_name"] == "SiameseNetwork"
    # metrics written
    logs = list((tmp_path / "logs").rglob("metrics.jsonl"))
    assert len(logs) == 2  # train + dev writers


def test_training_reduces_loss(corpus, tmp_path):  # noqa: F811
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path, hidden_dim=32)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=1, seed=0)
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.01, num_epochs=15,
                             patience=20, log_dir=str(tmp_path / "logs"),
                             seed=0)
    trainer.train()
    assert trainer.train_losses[-1] < trainer.train_losses[0]


def test_pad_batch_loss_invariant(corpus, tmp_path):  # noqa: F811
    """Bucket padding must not change the loss."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    net.ensure_init(0)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=1, seed=0)
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", num_epochs=1,
                             log_dir=str(tmp_path / "logs"))
    batch = next(dl.batch_iterator(True))
    padded = trainer._pad_batch(batch)
    assert padded.x1.shape[0] >= batch.x1.shape[0]
    assert padded.x1.shape[0] & (padded.x1.shape[0] - 1) == 0  # pow2
    loss = coscos2()
    unpadded_val = float(loss(batch.x1, batch.x2, batch.y,
                              weights=batch.weights))
    padded_val = float(loss(padded.x1, padded.x2, padded.y,
                            weights=padded.weights))
    assert padded_val == pytest.approx(unpadded_val, rel=1e-6)


def test_multitask_trainer(corpus, tmp_path):  # noqa: F811
    feats_path, pairs_path, spk_path = corpus
    net = SiameseMultitaskNetwork(
        input_dim=4, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=16, output_dim=8,
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "network"))
    dl = MultiTaskDataLoader(pairs_path, feats_path, fid2spk_file=spk_path,
                             batch_size=3, num_max_minibatches=2, seed=0)
    loss = weighted_loss_multi(weight=0.5, loss_phn=coscos2(),
                               loss_spk=cosmargin())
    trainer = TrainerSiameseMultitask(
        network=net, loss=loss, dataloader=dl, optimizer_type="adam",
        lr=0.01, num_epochs=2, patience=5,
        log_dir=str(tmp_path / "logs"), seed=0)
    trainer.train()
    assert len(trainer.train_losses) == 3
    assert all(np.isfinite(trainer.train_losses))


def test_bank_backend_training(corpus, tmp_path):  # noqa: F811
    """align_backend='bank': the whole token corpus lives on device and
    training streams only index batches; must converge like the device
    backend."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path, hidden_dim=32)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=8,
                            num_max_minibatches=1, seed=0,
                            align_backend="bank")
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.01, num_epochs=10,
                             patience=20, log_dir=str(tmp_path / "logs"),
                             seed=0)
    trainer.train()
    assert dl.token_bank is not None
    assert trainer.train_losses[-1] < trainer.train_losses[0]
    assert all(np.isfinite(trainer.train_losses))
    # epoch-0 loss must match the device backend's epoch-0 loss (same
    # pairs, same initial params, both evaluate in eval mode)
    net2 = _network(tmp_path, hidden_dim=32)
    dl2 = OriginalDataLoader(pairs_path, feats_path, batch_size=8,
                             num_max_minibatches=1, seed=0,
                             align_backend="device")
    t2 = TrainerSiamese(network=net2, loss=coscos2(), dataloader=dl2,
                        optimizer_type="adam", lr=0.01, num_epochs=1,
                        patience=5, log_dir=str(tmp_path / "logs2"),
                        seed=0)
    t2.train()
    assert trainer.dev_losses[0] == pytest.approx(t2.dev_losses[0],
                                                  rel=1e-4)


def test_bank_backend_multitask(corpus, tmp_path):  # noqa: F811
    feats_path, pairs_path, spk_path = corpus
    net = SiameseMultitaskNetwork(
        input_dim=4, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=16, output_dim=8,
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "network"))
    dl = MultiTaskDataLoader(pairs_path, feats_path, fid2spk_file=spk_path,
                             batch_size=4, num_max_minibatches=2, seed=0,
                             align_backend="bank")
    loss = weighted_loss_multi(weight=0.5, loss_phn=coscos2(),
                               loss_spk=cosmargin())
    trainer = TrainerSiameseMultitask(
        network=net, loss=loss, dataloader=dl, optimizer_type="adam",
        lr=0.01, num_epochs=2, patience=5,
        log_dir=str(tmp_path / "logs"), seed=0)
    trainer.train()
    assert len(trainer.train_losses) == 3
    assert all(np.isfinite(trainer.train_losses))


def test_bank_training_on_mesh(corpus, tmp_path):  # noqa: F811
    """Bank training sharded over the 8-device virtual mesh via the
    YAML-friendly mesh dict."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=8,
                            num_max_minibatches=1, seed=0,
                            align_backend="bank")
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.01, num_epochs=2,
                             patience=5, log_dir=str(tmp_path / "logs"),
                             seed=0, mesh={"data": 8, "model": 1})
    trainer.train()
    assert trainer.mesh.shape == {"data": 8, "model": 1}
    assert all(np.isfinite(trainer.train_losses))
    # whoami stays picklable with a mesh attached
    import pickle
    pickle.dumps({k: str(v) for k, v in trainer.whoami().items()})


def test_chained_steps_match_single(tmp_path):
    """K-chained dispatches must apply exactly the same updates as
    single-step dispatches (same batch order, no dropout).

    Exact equivalence needs a single length bucket: with several buckets
    the per-bucket buffering reorders updates (documented behavior)."""
    from abnet3_tpu.io import write_h5features
    rng = np.random.RandomState(0)
    feats_path = str(tmp_path / "feats.h5f")
    items = [f"f{i}" for i in range(4)]
    feats = [rng.randn(80, 4).astype(np.float32) for _ in items]
    times = [np.arange(80) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)

    def tok(i, a):
        return f"f{i} {a:.2f} {a + 0.10:.2f}"  # uniform 11-frame tokens

    lines = []
    for j in range(6):
        a, b = rng.randint(0, 4, 2)
        lines.append(f"{tok(a, 0.05 + 0.1 * j)} {tok(b, 0.1 * j)} "
                     f"{'same' if j % 2 else 'diff'}")
    pairs_path = str(tmp_path / "pairs")
    import os
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    open(os.path.join(pairs_path, "train_pairs/dataset"),
         "w").write("\n".join(lines) + "\n")
    open(os.path.join(pairs_path, "dev_pairs/dataset"),
         "w").write(lines[0] + "\n")

    def run(k, outdir):
        net = _network(outdir)
        dl = OriginalDataLoader(pairs_path, feats_path, batch_size=2,
                                num_max_minibatches=3, seed=0,
                                align_backend="bank", steps_per_call=k)
        tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                            optimizer_type="adam", lr=0.01, num_epochs=2,
                            patience=5, log_dir=str(outdir / "logs"),
                            seed=0)
        tr.train()
        return net.params, tr.train_losses

    d1 = tmp_path / "k1"
    d1.mkdir()
    p1, losses1 = run(1, d1)
    d3 = tmp_path / "k3"
    d3.mkdir()
    p3, losses3 = run(3, d3)
    # k=2: 3 train batches = one full chunk + one PARTIAL flush chunk,
    # which pads to K with a zero valid mask and reuses the K-chained
    # executable — updates must still match the single-step run exactly
    d2 = tmp_path / "k2"
    d2.mkdir()
    p2, losses2 = run(2, d2)
    for pk, lossesk in ((p3, losses3), (p2, losses2)):
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(pk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        # per-epoch mean losses agree (chunk means of the same values)
        assert losses1[-1] == pytest.approx(lossesk[-1], rel=1e-4)


def test_chained_dev_evals_match_single(tmp_path):
    """K-chained dev-eval dispatches produce the same per-epoch dev
    losses as single-step evaluation (same batches, same params)."""
    from abnet3_tpu.io import write_h5features
    rng = np.random.RandomState(3)
    feats_path = str(tmp_path / "feats.h5f")
    items = [f"f{i}" for i in range(4)]
    feats = [rng.randn(80, 4).astype(np.float32) for _ in items]
    times = [np.arange(80) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)

    def tok(i, a):
        return f"f{i} {a:.2f} {a + 0.10:.2f}"

    lines = []
    for j in range(8):
        a, b = rng.randint(0, 4, 2)
        lines.append(f"{tok(a, 0.05 + 0.1 * j)} {tok(b, 0.1 * j)} "
                     f"{'same' if j % 2 else 'diff'}")
    pairs_path = str(tmp_path / "pairs")
    import os
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    open(os.path.join(pairs_path, "train_pairs/dataset"),
         "w").write("\n".join(lines[:4]) + "\n")
    # 7 dev pairs -> at batch_size 2: 3-4 dev batches; K=3 chains one
    # full chunk + flushes the partial remainder single-step
    open(os.path.join(pairs_path, "dev_pairs/dataset"),
         "w").write("\n".join(lines[1:]) + "\n")

    def run(k, outdir):
        net = _network(outdir)
        dl = OriginalDataLoader(pairs_path, feats_path, batch_size=2,
                                num_max_minibatches=4, seed=0,
                                align_backend="bank", steps_per_call=k)
        tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                            optimizer_type="adam", lr=0.01, num_epochs=2,
                            patience=5, log_dir=str(outdir / "logs"),
                            seed=0)
        tr.train()
        return tr.dev_losses

    d1 = tmp_path / "k1"
    d1.mkdir()
    dev1 = run(1, d1)
    d3 = tmp_path / "k3"
    d3.mkdir()
    dev3 = run(3, d3)
    assert len(dev1) == len(dev3)
    for a, b in zip(dev1, dev3):
        assert a == pytest.approx(b, rel=1e-4)


def test_checkpoint_resume(corpus, tmp_path):  # noqa: F811
    """Training must resume from a checkpoint with full state (params,
    optimizer, early-stopping counters, loss history)."""
    feats_path, pairs_path, _ = corpus

    def make(num_epochs, outdir):
        net = _network(outdir)
        dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                                num_max_minibatches=1, seed=0)
        return TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                              optimizer_type="adam", lr=0.01,
                              num_epochs=num_epochs, patience=50,
                              log_dir=str(outdir / "logs"), seed=0)

    # uninterrupted 6-epoch run
    full_dir = tmp_path / "full"
    full_dir.mkdir()
    t_full = make(6, full_dir)
    t_full.train()

    # 3 epochs, then resume for 6 total
    part_dir = tmp_path / "part"
    part_dir.mkdir()
    t_a = make(3, part_dir)
    t_a.train()
    assert os.path.exists(str(part_dir / "network.ckpt"))
    t_b = make(6, part_dir)
    t_b.train(resume=True)

    assert len(t_b.train_losses) == len(t_full.train_losses)
    # the resumed run continues the same trajectory
    assert t_b.train_losses[-1] == pytest.approx(t_full.train_losses[-1],
                                                 rel=1e-4)
    assert t_b.dev_losses[-1] == pytest.approx(t_full.dev_losses[-1],
                                               rel=1e-4)


def test_early_stopping(corpus, tmp_path):  # noqa: F811
    """With patience 0 and lr 0 (no improvement possible), training must
    stop after the second epoch."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=1, seed=0)
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="sgd", lr=0.0, momentum=0.0,
                             num_epochs=50, patience=0,
                             log_dir=str(tmp_path / "logs"), seed=0)
    trainer.train()
    # epoch0 + first epoch (improves over None) + second epoch (equal dev
    # loss, not better) -> stop
    assert len(trainer.train_losses) <= 4


@pytest.mark.parametrize("matrix", [False, True], ids=["gather", "matrix"])
def test_lbfgs_converges_through_bank_loader(corpus, tmp_path, matrix):  # noqa: F811
    """LBFGS through make_pair_train_step (align_backend='bank',
    bank_split=False): the round-4 prepare/apply hoist keeps the DTW
    alignment out of the loss closure the zoom linesearch re-evaluates —
    convergence must hold on both the gather and matrix paths."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=1, seed=0,
                            align_backend="bank", bank_split=False,
                            shuffle_between_epochs=False)
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="LBFGS", lr=1.0,
                             num_epochs=8, patience=10,
                             log_dir=str(tmp_path / "logs"), seed=0,
                             matrix_loss=matrix)
    trainer.train()
    assert all(np.isfinite(trainer.train_losses))
    assert trainer.train_losses[-1] < 0.8 * trainer.train_losses[0]


def test_prewarm_preserves_training_trajectory(corpus, tmp_path,  # noqa: F811
                                               monkeypatch):
    """The compile prewarm (background-thread warm calls of every
    (bucket, kind) chained executable before the first pass) must not
    change anything observable: the peek at the batch streams restores
    the loader RNG/statistics, and the warm dispatches discard their
    outputs — losses and final params match a run without prewarm."""
    feats_path, pairs_path, _ = corpus

    def run(prewarm, outdir):
        monkeypatch.setenv("ABNET3_TRAIN_PREWARM", "1" if prewarm else "0")
        net = _network(outdir)
        dl = OriginalDataLoader(pairs_path, feats_path, batch_size=2,
                                num_max_minibatches=3, seed=0,
                                shuffle_between_epochs=True,
                                align_backend="bank", steps_per_call=2)
        tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                            optimizer_type="adam", lr=0.01, num_epochs=2,
                            patience=5, log_dir=str(outdir / "logs"),
                            seed=0)
        tr.train()
        return net.params, tr.train_losses, tr.dev_losses

    d_off = tmp_path / "off"
    d_off.mkdir()
    p_off, tl_off, dl_off = run(False, d_off)
    d_on = tmp_path / "on"
    d_on.mkdir()
    p_on, tl_on, dl_on = run(True, d_on)
    assert tl_on == pytest.approx(tl_off, rel=1e-6)
    assert dl_on == pytest.approx(dl_off, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_off),
                    jax.tree_util.tree_leaves(p_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_prewarm_peek_restores_frames_loader_state(corpus, tmp_path,  # noqa: F811
                                                   monkeypatch):
    """The prewarm peek must restore ALL mutable iteration state, not
    just the RNG: FramesDataLoader's _epoch_batch_ids shuffles
    frame_pairs IN PLACE and advances batch_position (review finding —
    restoring the RNG alone leaves an extra shuffle behind and skips
    the first max_batches_per_epoch window of epoch 0)."""
    import random as pyrandom
    feats_path, pairs_path, _ = corpus
    from abnet3_tpu.dataloader import FramesDataLoader
    monkeypatch.setenv("ABNET3_TRAIN_PREWARM", "1")
    net = _network(tmp_path)
    dl = FramesDataLoader(pairs_path, feats_path, batch_size=8,
                          randomize_dataset=True, max_batches_per_epoch=2,
                          align_backend="device", steps_per_call=2)
    dl._rng = np.random.RandomState(0)
    tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                        optimizer_type="adam", lr=0.01, num_epochs=1,
                        patience=5, log_dir=str(tmp_path / "logs"), seed=0)
    tr.network.ensure_init(tr.seed)
    dl.load_data()
    fp_before = {m: v.copy() for m, v in dl.frame_pairs.items()}
    pos_before = dl.batch_position
    rng_before = dl._rng.get_state()
    py_before = pyrandom.getstate()
    tr._prewarm_chain_steps()
    assert dl.batch_position == pos_before
    for m in fp_before:
        np.testing.assert_array_equal(dl.frame_pairs[m], fp_before[m])
    after = dl._rng.get_state()
    assert after[0] == rng_before[0]
    np.testing.assert_array_equal(after[1], rng_before[1])
    assert after[2:] == rng_before[2:]
    assert pyrandom.getstate() == py_before


def test_prewarm_skips_train_compile_for_dev_only_keys(corpus, tmp_path,  # noqa: F811
                                                       monkeypatch):
    """Keys seen only in the dev stream (FrameBankBatch mode='dev')
    never see a train dispatch, so prewarm must not compile (and block
    on) a train executable for them — only train-stream keys warm both
    (the epoch-0 eval routes the train iterator through the eval step)."""
    feats_path, pairs_path, _ = corpus
    from abnet3_tpu.dataloader import FramesDataLoader
    monkeypatch.setenv("ABNET3_TRAIN_PREWARM", "1")
    net = _network(tmp_path)
    dl = FramesDataLoader(pairs_path, feats_path, batch_size=8,
                          randomize_dataset=False,
                          align_backend="device", steps_per_call=2)
    dl._rng = np.random.RandomState(0)
    tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                        optimizer_type="adam", lr=0.01, num_epochs=1,
                        patience=5, log_dir=str(tmp_path / "logs"), seed=0)
    tr.network.ensure_init(tr.seed)
    calls = []

    def fake_steps_for(b, k):
        mode = getattr(b, "mode", None)

        def train_fn(*a, **kw):
            calls.append(("train", mode))
            return (tr.network.params, tr.network.state,
                    tr._opt_state, jnp.zeros(()))

        def eval_fn(*a, **kw):
            calls.append(("eval", mode))
            return jnp.zeros((k,))

        return train_fn, eval_fn

    monkeypatch.setattr(tr, "_steps_for", fake_steps_for)
    tr._prewarm_chain_steps()
    assert ("eval", "train") in calls
    assert ("eval", "dev") in calls
    assert ("train", "train") in calls
    assert ("train", "dev") not in calls


def test_prewarm_preserves_frames_loader_trajectory(corpus, tmp_path,  # noqa: F811
                                                    monkeypatch):
    """End-to-end twin of test_prewarm_preserves_training_trajectory for
    the loader whose iteration state the peek mutates most (in-place
    epoch shuffles + batch_position): losses and params match a
    no-prewarm run exactly."""
    feats_path, pairs_path, _ = corpus
    from abnet3_tpu.dataloader import FramesDataLoader

    def run(prewarm, outdir):
        monkeypatch.setenv("ABNET3_TRAIN_PREWARM", "1" if prewarm else "0")
        net = _network(outdir)
        dl = FramesDataLoader(pairs_path, feats_path, batch_size=8,
                              randomize_dataset=True,
                              max_batches_per_epoch=2,
                              align_backend="device", steps_per_call=2)
        dl._rng = np.random.RandomState(0)
        tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                            optimizer_type="adam", lr=0.01, num_epochs=3,
                            patience=5, log_dir=str(outdir / "logs"),
                            seed=0)
        tr.train()
        return net.params, tr.train_losses, tr.dev_losses

    d_off = tmp_path / "off"
    d_off.mkdir()
    p_off, tl_off, dl_off = run(False, d_off)
    d_on = tmp_path / "on"
    d_on.mkdir()
    p_on, tl_on, dl_on = run(True, d_on)
    assert tl_on == pytest.approx(tl_off, rel=1e-6)
    assert dl_on == pytest.approx(dl_off, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_off),
                    jax.tree_util.tree_leaves(p_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_lbfgs_degenerate_step_does_not_poison_params(corpus, tmp_path):  # noqa: F811
    """Once a tiny objective is nearly minimized, LBFGS's zoom
    linesearch can emit a NaN step (zero curvature); unguarded, that
    silently poisons the params and the L-BFGS history for the rest of
    the run (observed: finite train losses, then dev loss = nan).
    build_optimizer wraps LBFGS in optax.apply_if_finite, which drops
    the nonfinite step and keeps the previous inner state."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=2,
                            num_max_minibatches=3, seed=0,
                            shuffle_between_epochs=True,
                            align_backend="bank", steps_per_call=2)
    tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                        optimizer_type="LBFGS", lr=1.0, num_epochs=2,
                        patience=5, log_dir=str(tmp_path / "logs"), seed=0)
    tr.train()
    assert all(np.isfinite(tr.train_losses)), tr.train_losses
    assert all(np.isfinite(tr.dev_losses)), tr.dev_losses
    for leaf in jax.tree_util.tree_leaves(net.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_finite_step_guard_drops_nan_producing_step():
    """_finite_step_guard must reject steps whose PRODUCED updates/state
    are nonfinite even when the incoming grads are finite (review
    finding: optax.apply_if_finite only checks the incoming grads, so a
    degenerate LBFGS linesearch NaN passed straight through), and must
    add no state leaves so checkpoints stay structure-compatible."""
    import optax
    from abnet3_tpu.trainer import _finite_step_guard

    def init(p):
        return {"mem": jnp.zeros(3)}

    def bad_update(g, s, p=None):
        return (jax.tree_util.tree_map(lambda x: x * jnp.nan, g),
                {"mem": s["mem"] + jnp.inf})

    tx = _finite_step_guard(optax.GradientTransformation(init, bad_update))
    params = {"w": jnp.ones(3)}
    s = tx.init(params)
    grads = {"w": jnp.full(3, 0.5)}  # finite grads in
    u, s2 = tx.update(grads, s, params)
    np.testing.assert_array_equal(np.asarray(u["w"]), 0.0)  # dropped
    np.testing.assert_array_equal(np.asarray(s2["mem"]),
                                  np.asarray(s["mem"]))  # state kept

    def good_update(g, s, p=None):
        return g, {"mem": s["mem"] + 1.0}

    tx = _finite_step_guard(optax.GradientTransformation(init, good_update))
    u, s2 = tx.update(grads, tx.init(params), params)
    np.testing.assert_array_equal(np.asarray(u["w"]), 0.5)  # pass-through
    np.testing.assert_array_equal(np.asarray(s2["mem"]), 1.0)

    # no extra state leaves vs the bare inner optimizer
    bare = optax.lbfgs(1.0).init(params)
    wrapped = build_optimizer("LBFGS", 1.0).init(params)
    assert (jax.tree_util.tree_structure(bare)
            == jax.tree_util.tree_structure(wrapped))


def test_early_stop_persists_stopping_epoch_counters(corpus, tmp_path):  # noqa: F811
    """The early-stop break must checkpoint the stopping epoch's
    counters (review finding: breaking before save_checkpoint left the
    newest checkpoint one epoch behind, so a resume re-ran an epoch the
    first run had already discarded)."""
    feats_path, pairs_path, _ = corpus
    net = _network(tmp_path)
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=1, seed=0)
    tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                        optimizer_type="sgd", lr=0.0, momentum=0.0,
                        num_epochs=50, patience=0,
                        log_dir=str(tmp_path / "logs"), seed=0)
    tr.train()  # lr=0: dev loss flat -> early stop
    assert tr.patience_dev > tr.patience
    from abnet3_tpu.serialize import load_pytree
    _tree, meta = load_pytree(tr._ckpt_path)
    assert meta["patience_dev"] == tr.patience_dev
    assert meta["epoch"] == len(tr.train_losses) - 2  # stopping epoch


def test_prefetch_iterator_unblocks_worker_on_abandon():
    """An abandoned consumer must unblock the prefetch worker (review
    finding: the worker parked forever on q.put into a full queue,
    pinning batches across retried epochs)."""
    import threading as _threading
    from abnet3_tpu.dataloader import prefetch_iterator
    alive_before = _threading.active_count()
    it = prefetch_iterator(iter(range(100)), size=2)
    assert next(it) == 0
    it.close()  # GeneratorExit -> stop flag -> worker exits
    deadline = time.time() + 6
    while _threading.active_count() > alive_before and \
            time.time() < deadline:
        time.sleep(0.05)
    assert _threading.active_count() <= alive_before
