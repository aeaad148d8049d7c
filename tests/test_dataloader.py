"""Dataloader tests: device batches vs host parity, loader zoo behavior."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from abnet3_tpu.dataloader import (Batch, FramesDataLoader,
                                   MultimodalDataLoader, MultiTaskDataLoader,
                                   OriginalDataLoader, PairsDataLoader,
                                   TemporalCoherenceDataLoader,
                                   prefetch_iterator)
from abnet3_tpu.io import write_h5features
from abnet3_tpu.loss import coscos2


@pytest.fixture
def corpus(tmp_path):
    """Small corpus: 4 files x 80 frames x 4 dims + train/dev pair files."""
    rng = np.random.RandomState(0)
    d = 4
    feats_path = str(tmp_path / "feats.h5f")
    items = [f"f{i}" for i in range(4)]
    feats = [rng.randn(80, d).astype(np.float32) for _ in items]
    times = [np.arange(80) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)

    def tok(i, a, b):
        return f"f{i} {a:.2f} {b:.2f}"

    train_lines = [
        f"{tok(0, 0.0, 0.12)} {tok(1, 0.3, 0.39)} same",
        f"{tok(1, 0.0, 0.2)} {tok(2, 0.1, 0.25)} same",
        f"{tok(2, 0.3, 0.5)} {tok(3, 0.0, 0.08)} diff",
        f"{tok(0, 0.4, 0.55)} {tok(3, 0.2, 0.42)} diff",
        f"{tok(3, 0.5, 0.62)} {tok(0, 0.6, 0.7)} same",
        f"{tok(1, 0.5, 0.58)} {tok(2, 0.6, 0.75)} diff",
    ]
    dev_lines = [
        f"{tok(0, 0.1, 0.2)} {tok(2, 0.4, 0.52)} same",
        f"{tok(1, 0.6, 0.7)} {tok(3, 0.6, 0.72)} diff",
    ]
    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write("\n".join(dev_lines) + "\n")

    spk_path = str(tmp_path / "spk.txt")
    with open(spk_path, "w") as f:
        f.write("f0 spkA\nf1 spkA\nf2 spkB\nf3 spkB\n")
    return feats_path, pairs_path, spk_path


def _loss_of(batch: Batch):
    return float(coscos2()(batch.x1, batch.x2, batch.y,
                           weights=batch.weights))


def test_device_batch_matches_host(corpus):
    """The device-aligned masked batch must contain exactly the host
    path's frame pairs (verified through the loss, which is
    permutation-invariant)."""
    feats_path, pairs_path, _ = corpus
    dl_dev = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                                num_max_minibatches=1, seed=0,
                                align_backend="device")
    dl_host = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                                 num_max_minibatches=1, seed=0,
                                 align_backend="host")
    b_dev = next(dl_dev.batch_iterator(train_mode=True))
    b_host = next(dl_host.batch_iterator(train_mode=True))
    assert b_dev.weights is not None
    # same number of valid frames
    assert int(np.asarray(jnp.sum(b_dev.weights))) == len(b_host.y)
    # identical loss over the frame multiset
    assert _loss_of(b_dev) == pytest.approx(_loss_of(b_host), rel=1e-4)


def test_device_batch_labels_and_mask(corpus):
    feats_path, pairs_path, _ = corpus
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=3, seed=0)
    batches = list(dl.batch_iterator(train_mode=True))
    assert len(batches) == 1  # 6 pairs / batch_size 6 -> 1 batch
    b = batches[0]
    y = np.asarray(b.y)
    w = np.asarray(b.weights)
    assert set(np.unique(y)).issubset({-1.0, 1.0})
    assert set(np.unique(w)).issubset({0.0, 1.0})
    # padding exists and everything stays finite (padded rows repeat the
    # path endpoint frame; the weight vector zeroes their loss)
    assert (w == 0.0).any() and (w == 1.0).any()
    assert np.all(np.isfinite(np.asarray(b.x1)))
    assert dl.statistics_training["SameType"] == 3
    assert dl.statistics_training["DiffType"] == 3


def test_epoch_sampling_counts(corpus):
    feats_path, pairs_path, _ = corpus
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=2,
                            num_max_minibatches=2, seed=0)
    assert len(list(dl.batch_iterator(True))) == 2
    # dev has 2 pairs -> 1 batch of 2
    assert len(list(dl.batch_iterator(False))) == 1


def test_multitask_loader(corpus):
    feats_path, pairs_path, spk_path = corpus
    dl = MultiTaskDataLoader(pairs_path, feats_path, fid2spk_file=spk_path,
                             batch_size=6, num_max_minibatches=1, seed=0)
    b = next(dl.batch_iterator(True))
    assert b.y_spk is not None
    y_spk = np.asarray(b.y_spk)
    assert set(np.unique(y_spk)).issubset({-1.0, 1.0})
    # f0-f1 same speaker pair exists -> some +1 speaker labels
    w = np.asarray(b.weights)
    assert (y_spk[w > 0] == 1.0).any() and (y_spk[w > 0] == -1.0).any()


def test_frames_dataloader(corpus):
    feats_path, pairs_path, _ = corpus
    dl = FramesDataLoader(pairs_path, feats_path, batch_size=16,
                          randomize_dataset=True)
    batches = list(dl.batch_iterator(True))
    # device path: index-only batches into the HBM frame table
    from abnet3_tpu.dataloader import FrameBankBatch
    assert all(isinstance(b, FrameBankBatch) and b.i1.shape == (16,)
               for b in batches)
    # total frame pairs matches the host computation
    dl_host = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                                 num_max_minibatches=1, seed=0,
                                 align_backend="host")
    dl_host.load_data()
    from abnet3_tpu.utils import group_pairs
    X1, X2, y = dl_host.load_frames_from_pairs(
        group_pairs(dl_host.pairs["train"]))
    total_dev = len(dl.frame_pairs["train"])
    assert total_dev == len(y)


def test_frames_dataloader_max_batches(corpus):
    feats_path, pairs_path, _ = corpus
    dl = FramesDataLoader(pairs_path, feats_path, batch_size=8,
                          randomize_dataset=False, max_batches_per_epoch=2)
    assert len(list(dl.batch_iterator(True))) == 2
    n2 = len(list(dl.batch_iterator(True)))
    assert n2 >= 1  # continues from position, may hit dataset end


def test_temporal_coherence_loader(corpus):
    feats_path, pairs_path, _ = corpus
    dl = TemporalCoherenceDataLoader(pairs_path, feats_path, batch_size=20,
                                     num_max_minibatches=3)
    batches = list(dl.batch_iterator(True))
    assert len(batches) == 3
    y = np.asarray(batches[0].y)
    # 1 same : 4 diff pattern per draw (reference dataloader.py:51-52)
    assert (y == 1).sum() * 4 == (y == -1).sum()
    # dev path yields word-pair batches
    dev_batches = list(dl.batch_iterator(False))
    assert len(dev_batches) >= 1


def test_tcl_mixing(corpus):
    feats_path, pairs_path, _ = corpus
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                            num_max_minibatches=1, seed=0, tcl=0.5)
    b = next(dl.batch_iterator(True))
    w = np.asarray(b.weights)
    n_valid = w.sum()
    # about half the valid frames should be TCL pairs (weight exactly 1)
    base = OriginalDataLoader(pairs_path, feats_path, batch_size=6,
                              num_max_minibatches=1, seed=0)
    nb = float(np.asarray(next(base.batch_iterator(True)).weights).sum())
    assert n_valid > nb  # TCL pairs appended


def test_pairs_dataloader(tmp_path):
    rng = np.random.RandomState(0)
    feats_path = str(tmp_path / "feats.h5f")
    items = [f"file{i}" for i in range(4)]
    feats = [rng.randn(120, 3).astype(np.float32) for _ in items]
    times = [np.arange(120) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)

    pair_lines = []
    for i in range(20):
        fa, fb = rng.randint(0, 4, 2)
        b1 = int(rng.randint(0, 60))
        b2 = int(rng.randint(0, 60))
        l1, l2 = int(rng.randint(4, 12)), int(rng.randint(4, 12))
        pair_lines.append(
            f"{fa} {fb} {b1} {b1+l1} {b2} {b2+l2} 0.5\n")
    pairs_path = str(tmp_path / "pairs_knn.txt")
    with open(pairs_path, "w") as f:
        f.writelines(pair_lines)
    id_map_path = str(tmp_path / "id_to_file.txt")
    with open(id_map_path, "w") as f:
        f.writelines(f"{i} file{i}\n" for i in range(4))

    dl = PairsDataLoader(pairs_path, feats_path, id_to_file=id_map_path,
                         batch_size=4, train_iterations=3,
                         test_iterations=2, split_method="split_each_file")
    dl.load_pairs()
    n_train = len(dl.pairs["train"])
    n_test = len(dl.pairs["test"])
    assert n_train + n_test <= 20 and n_train > 0
    # file names mapped
    assert all(isinstance(p[0], str) for p in dl.pairs["train"])

    batches = list(dl.batch_iterator(train_mode=True))
    assert 1 <= len(batches) <= 3
    b = batches[0]
    assert set(np.unique(np.asarray(b.y))).issubset({-1.0, 1.0})


def test_pairs_dataloader_bank_backend(tmp_path):
    """PairsDataLoader with the HBM bank: index-only BankBatches + a
    trainer run."""
    from abnet3_tpu.dataloader import BankBatch
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.trainer import TrainerSiamese

    rng = np.random.RandomState(0)
    feats_path = str(tmp_path / "feats.h5f")
    items = [f"file{i}" for i in range(4)]
    feats = [rng.randn(120, 3).astype(np.float32) for _ in items]
    times = [np.arange(120) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)
    pair_lines = []
    for i in range(20):
        fa, fb = rng.randint(0, 4, 2)
        b1, b2 = int(rng.randint(0, 60)), int(rng.randint(0, 60))
        l1, l2 = int(rng.randint(4, 12)), int(rng.randint(4, 12))
        pair_lines.append(f"{fa} {fb} {b1} {b1+l1} {b2} {b2+l2} 0.5\n")
    pairs_path = str(tmp_path / "pairs_knn.txt")
    open(pairs_path, "w").writelines(pair_lines)
    id_map = str(tmp_path / "ids.txt")
    open(id_map, "w").writelines(f"{i} file{i}\n" for i in range(4))

    dl = PairsDataLoader(pairs_path, feats_path, id_to_file=id_map,
                         batch_size=4, train_iterations=3,
                         test_iterations=2,
                         split_method="split_each_file",
                         align_backend="bank")
    batches = list(dl.batch_iterator(train_mode=True))
    assert batches and all(isinstance(b, BankBatch) for b in batches)
    assert all(b.ids1.shape == (4,) for b in batches)

    net = SiameseNetwork(input_dim=3, num_hidden_layers=1, hidden_dim=8,
                         output_dim=4, p_dropout=0.0,
                         activation_layer="sigmoid",
                         output_path=str(tmp_path / "net"))
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.01, num_epochs=1,
                             patience=3, log_dir=str(tmp_path / "logs"),
                             seed=0)
    trainer.train()
    assert all(np.isfinite(trainer.train_losses))


def test_split_bank_batches(corpus):
    """Default bank batches carry a static same/diff split so the fused
    step runs the DTW DP only on the same-word group."""
    from abnet3_tpu.dataloader import SplitBankBatch
    feats_path, pairs_path, _ = corpus
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=4,
                            num_max_minibatches=10, seed=0,
                            align_backend="bank")
    batches = list(dl.batch_iterator(True))
    assert batches and all(isinstance(b, SplitBankBatch) for b in batches)
    lens = dl.token_bank.lengths_host
    types = None
    # every valid same-group entry really is a same pair from the file
    ids1, ids2, ys, _, _buckets = dl._bank_pairs["train"]
    same_set = {(a, b) for a, b, y in zip(ids1, ids2, ys) if y > 0}
    diff_set = {(a, b) for a, b, y in zip(ids1, ids2, ys) if y < 0}
    seen_same, seen_diff = set(), set()
    for b in batches:
        ws = np.asarray(b.ws)
        wd = np.asarray(b.wd)
        for i in np.nonzero(ws > 0)[0]:
            key = (int(np.asarray(b.ids1s)[i]), int(np.asarray(b.ids2s)[i]))
            assert key in same_set
            seen_same.add(key)
        for i in np.nonzero(wd > 0)[0]:
            key = (int(np.asarray(b.ids1d)[i]), int(np.asarray(b.ids2d)[i]))
            assert key in diff_set
            seen_diff.add(key)
        # bucket covers every valid token in the batch
        for i in np.nonzero(ws > 0)[0]:
            assert lens[np.asarray(b.ids1s)[i]] <= b.bucket
    assert seen_same == same_set and seen_diff == diff_set

    # escape hatch: bank_split=False yields mixed BankBatches
    from abnet3_tpu.dataloader import BankBatch
    dl2 = OriginalDataLoader(pairs_path, feats_path, batch_size=4,
                             num_max_minibatches=10, seed=0,
                             align_backend="bank", bank_split=False)
    assert all(isinstance(b, BankBatch)
               for b in dl2.batch_iterator(True))


def test_tcl_bank_nonsplit_loss_mixture(corpus):
    """tcl > 0 on the NON-split bank path (the round-2 guarded hole):
    mixed BankBatches carry the static tcl frame-index group and the
    step's loss is exactly (1-tcl)*L_tokens + tcl*L_tcl, same as the
    split path (reference dataloader.py:314-322)."""
    import optax
    from abnet3_tpu.dataloader import BankBatch
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.parallel import make_mesh, make_pair_train_step

    feats_path, pairs_path, _ = corpus
    tcl = 0.3
    dl = OriginalDataLoader(pairs_path, feats_path, tcl=tcl,
                            align_backend="bank", bank_split=False,
                            batch_size=4, num_max_minibatches=4, seed=0)
    b = next(iter(dl.batch_iterator(True)))
    assert isinstance(b, BankBatch) and b.tcl_i1 is not None
    net = SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=8,
                         output_dim=4, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    loss = coscos2()
    opt = optax.adam(1e-3)
    mesh = make_mesh(n_data=1, n_model=1)

    def eval_for(frame_bank, tcl_v, args):
        _, ev = make_pair_train_step(
            net, loss, opt, dl.token_bank, mesh, max_frames=b.bucket,
            frame_bank=frame_bank, tcl=tcl_v)
        return float(ev(net.params, net.state, *args))

    tok_args = (b.ids1, b.ids2, b.y, b.pair_w)
    full = eval_for(dl.frame_bank, tcl,
                    tok_args + (b.tcl_i1, b.tcl_i2, b.tcl_y, b.tcl_w))
    tokens_only = eval_for(None, 0.0, tok_args)
    x1 = np.asarray(dl.frame_bank)[np.asarray(b.tcl_i1)]
    x2 = np.asarray(dl.frame_bank)[np.asarray(b.tcl_i2)]
    e1, _ = net.forward_once(net.params, net.state, x1, train=False)
    e2, _ = net.forward_once(net.params, net.state, x2, train=False)
    tcl_only = float(loss(e1, e2, np.asarray(b.tcl_y)))
    np.testing.assert_allclose(
        full, (1 - tcl) * tokens_only + tcl * tcl_only, rtol=1e-5)


def test_tcl_bank_batches(corpus):
    """Bank-backend tcl batches carry a static frame-index group with
    valid in-file indices and the right same/diff labels."""
    feats_path, pairs_path, _ = corpus
    dl = OriginalDataLoader(pairs_path, feats_path, tcl=0.3,
                            align_backend="bank", batch_size=4,
                            num_max_minibatches=6, seed=0)
    batches = list(dl.batch_iterator(True))
    assert batches and dl.frame_bank is not None
    n_frames = dl.frame_bank.shape[0]
    sizes = set()
    for b in batches:
        assert b.tcl_i1 is not None
        sizes.add(len(b.tcl_i1))
        assert (np.asarray(b.tcl_i2) < n_frames).all()
        assert (np.asarray(b.tcl_i2) > np.asarray(b.tcl_i1)).all()
        deltas = np.asarray(b.tcl_i2) - np.asarray(b.tcl_i1)
        y = np.asarray(b.tcl_y)
        assert set(deltas[y > 0]) <= {1}
        assert set(deltas[y < 0]) <= {15, 20, 25, 30}
        assert (np.asarray(b.tcl_w) == 1.0).all()
    assert len(sizes) == 1  # static group size -> one compiled variant


def test_tcl_bank_loss_mixture(corpus):
    """The step's loss is exactly (1-tcl)*L_tokens + tcl*L_tcl (the
    reference's mixing fraction, dataloader.py:314-322)."""
    import jax
    import optax
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.parallel import make_mesh, make_split_pair_train_step

    feats_path, pairs_path, _ = corpus
    tcl = 0.3
    dl = OriginalDataLoader(pairs_path, feats_path, tcl=tcl,
                            align_backend="bank", batch_size=4,
                            num_max_minibatches=4, seed=0)
    b = next(iter(dl.batch_iterator(True)))
    net = SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=8,
                         output_dim=4, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    loss = coscos2()
    opt = optax.adam(1e-3)
    mesh = make_mesh(n_data=1, n_model=1)

    def eval_for(frame_bank, tcl_v, args):
        _, ev = make_split_pair_train_step(
            net, loss, opt, dl.token_bank, mesh, max_frames=b.bucket,
            frame_bank=frame_bank, tcl=tcl_v)
        return float(ev(net.params, net.state, *args))

    tok_args = (b.ids1s, b.ids2s, b.ws, b.ids1d, b.ids2d, b.wd)
    full = eval_for(dl.frame_bank, tcl,
                    tok_args + (b.tcl_i1, b.tcl_i2, b.tcl_y, b.tcl_w))
    tokens_only = eval_for(None, 0.0, tok_args)
    x1 = np.asarray(dl.frame_bank)[np.asarray(b.tcl_i1)]
    x2 = np.asarray(dl.frame_bank)[np.asarray(b.tcl_i2)]
    e1, _ = net.forward_once(net.params, net.state, x1, train=False)
    e2, _ = net.forward_once(net.params, net.state, x2, train=False)
    tcl_only = float(loss(e1, e2, np.asarray(b.tcl_y)))
    np.testing.assert_allclose(
        full, (1 - tcl) * tokens_only + tcl * tcl_only, rtol=1e-5)


def test_bank_shuffle_between_epochs(corpus):
    """shuffle_between_epochs on the bank backend reshuffles batch
    composition across epochs WITHIN length buckets (same compile
    variants, fresh pair mixes); with the flag off composition is
    stable."""
    feats_path, pairs_path, _ = corpus

    def epoch_compositions(shuffle):
        dl = OriginalDataLoader(pairs_path, feats_path,
                                align_backend="bank", batch_size=4,
                                num_max_minibatches=64, seed=0,
                                shuffle_between_epochs=shuffle)
        epochs = []
        for _ in range(2):
            comp = set()
            for b in dl.bank_batch_iterator(True):
                ids = tuple(np.asarray(b.ids1s)[np.asarray(b.ws) > 0])
                comp.add((ids, b.bucket))
            epochs.append(frozenset(comp))
        return epochs

    stable = epoch_compositions(False)
    assert stable[0] == stable[1]

    shuffled = epoch_compositions(True)
    assert shuffled[0] != shuffled[1]
    # bucketing preserved: the multiset of batch buckets is unchanged
    assert sorted(b for _, b in shuffled[0]) == \
        sorted(b for _, b in shuffled[1])


def test_tcl_bank_trains(corpus, tmp_path_factory):
    """End-to-end: bank backend with tcl > 0 trains and improves."""
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.trainer import TrainerSiamese

    feats_path, pairs_path, _ = corpus
    dl = OriginalDataLoader(pairs_path, feats_path, tcl=0.2,
                            align_backend="bank", batch_size=4,
                            num_max_minibatches=6, seed=0,
                            steps_per_call=2)
    net = SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=16,
                         output_dim=4, p_dropout=0.1,
                         activation_layer="sigmoid",
                         output_path=str(tmp_path_factory.getbasetemp()
                                         / "tcl_net"))
    tr = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                        optimizer_type="adam", lr=0.01, num_epochs=4,
                        patience=10, seed=0)
    tr.train()
    assert np.isfinite(tr.train_losses).all()
    assert tr.train_losses[-1] < tr.train_losses[0]


def test_prefetch_iterator():
    assert list(prefetch_iterator(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("inner failure")
    it = prefetch_iterator(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="inner failure"):
        list(it)


def test_multimodal_dataloader(corpus, tmp_path):
    feats_path, pairs_path, _ = corpus
    # second modality: same frame counts, different dim
    rng = np.random.RandomState(1)
    feats2_path = str(tmp_path / "feats2.h5f")
    items = [f"f{i}" for i in range(4)]
    feats2 = [rng.randn(80, 6).astype(np.float32) for _ in items]
    times = [np.arange(80) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats2_path, "features", items, times, feats2)

    # host parity path keeps the per-modality frame lists
    dl = MultimodalDataLoader(pairs_path, [feats_path, feats2_path],
                              batch_size=16, align_backend="host")
    b = next(dl.batch_iterator(True))
    assert isinstance(b.x1, list) and len(b.x1) == 2
    assert b.x1[0].shape == (16, 4)
    assert b.x1[1].shape == (16, 6)
    assert b.y.shape == (16,)
    # device path: index batches; per-modality tables live on device
    from abnet3_tpu.dataloader import FrameBankBatch
    dl_dev = MultimodalDataLoader(pairs_path, [feats_path, feats2_path],
                                  batch_size=16)
    bd = next(dl_dev.batch_iterator(True))
    assert isinstance(bd, FrameBankBatch) and bd.i1.shape == (16,)
    tables = dl_dev.frame_tables(True)
    assert len(tables) == 2
    assert tables[0].shape[1] == 4 and tables[1].shape[1] == 6


def test_tcl_bank_multidevice_mesh(corpus):
    """tcl batches run on a multi-device mesh: the group padding must fill
    tcl weights with 0 so padded entries contribute nothing."""
    import jax
    import optax
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.parallel import make_mesh, make_split_pair_train_step

    feats_path, pairs_path, _ = corpus
    tcl = 0.3
    dl = OriginalDataLoader(pairs_path, feats_path, tcl=tcl,
                            align_backend="bank", batch_size=4,
                            num_max_minibatches=4, seed=0)
    b = next(iter(dl.batch_iterator(True)))
    net = SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=8,
                         output_dim=4, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    loss = coscos2()
    opt = optax.adam(1e-3)
    args = (b.ids1s, b.ids2s, b.ws, b.ids1d, b.ids2d, b.wd,
            b.tcl_i1, b.tcl_i2, b.tcl_y, b.tcl_w)
    losses = {}
    for n_data in (1, 8):
        mesh = make_mesh(n_data=n_data, n_model=1)
        _, ev = make_split_pair_train_step(
            net, loss, opt, dl.token_bank, mesh, max_frames=b.bucket,
            frame_bank=dl.frame_bank, tcl=tcl)
        losses[n_data] = float(ev(net.params, net.state, *args))
    # group padding to the 8-device data axis must not change the loss
    np.testing.assert_allclose(losses[8], losses[1], rtol=1e-5)

    # and a train step must run (pad fill exercised on every arg)
    mesh = make_mesh(n_data=8, n_model=1)
    tr, _ = make_split_pair_train_step(
        net, loss, opt, dl.token_bank, mesh, max_frames=b.bucket,
        frame_bank=dl.frame_bank, tcl=tcl)
    _, _, _, v = tr(net.params, net.state, opt.init(net.params),
                    jax.random.PRNGKey(0), *args)
    assert np.isfinite(float(v))


def test_bank_ladder_handles_tokens_longer_than_4096(tmp_path):
    """Tokens longer than the last power-of-two ladder probe must land
    in the max_len bucket instead of indexing past the ladder end
    (review finding: np.searchsorted returned len(ladder) and
    _build_token_bank crashed with IndexError on any such corpus)."""
    rng = np.random.RandomState(0)
    d = 2
    n_frames = 4200  # > 4096, the old ladder's last probe
    feats_path = str(tmp_path / "feats.h5f")
    items = ["f0", "f1"]
    feats = [rng.randn(n_frames, d).astype(np.float32) for _ in items]
    times = [np.arange(n_frames) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)
    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    long_tok = f"0.00 {n_frames * 0.01:.2f}"
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write(f"f0 {long_tok} f1 {long_tok} same\n"
                f"f0 0.00 0.50 f1 0.00 0.50 diff\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write("f0 0.10 0.40 f1 0.10 0.40 same\n")
    dl = OriginalDataLoader(pairs_path, feats_path, batch_size=2,
                            num_max_minibatches=1, seed=0,
                            align_backend="bank", bank_split=False)
    dl.load_data()  # crashed here before the fix
    _, _, _, _, buckets = dl._bank_pairs["train"]
    assert buckets.max() == dl.token_bank.max_len
    assert dl.token_bank.max_len >= n_frames
