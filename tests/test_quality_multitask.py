"""Multitask learning quality: the phn head learns word identity while the
spk head learns speaker identity (Zeghidour et al. setup, SURVEY §2.1)."""

import os

import numpy as np
import pytest

from abnet3_tpu.dataloader import MultiTaskDataLoader
from abnet3_tpu.embedder import EmbedderSiameseMultitask
from abnet3_tpu.io import read_h5features, write_h5features
from abnet3_tpu.loss import coscos2, weighted_loss_multi
from abnet3_tpu.models import SiameseMultitaskNetwork
from abnet3_tpu.trainer import TrainerSiameseMultitask
from abnet3_tpu.utils import read_feats

from test_quality import D, _abx_error, _make_corpus  # noqa: F401


def _pair_lines(tok_meta, rng, n_pairs=400):
    """Hand-sample same/diff word pairs from the token metadata."""
    by_class = {}
    for c, f, t0, t1 in tok_meta:
        by_class.setdefault(c, []).append((f, t0, t1))
    classes = list(by_class)
    lines = []
    for i in range(n_pairs):
        if i % 2 == 0:
            c = classes[rng.randint(len(classes))]
            toks = by_class[c]
            a, b = [toks[j] for j in rng.choice(len(toks), 2,
                                                replace=False)]
            ptype = "same"
        else:
            ca, cb = rng.choice(classes, 2, replace=False)
            a = by_class[ca][rng.randint(len(by_class[ca]))]
            b = by_class[cb][rng.randint(len(by_class[cb]))]
            ptype = "diff"
        lines.append(f"{a[0]} {a[1]:.4f} {a[2]:.4f} "
                     f"{b[0]} {b[1]:.4f} {b[2]:.4f} {ptype}")
    return lines


def _spk_abx_error(accessor, tok_meta, rng, n_triples=300):
    """Across-word speaker ABX: A,B same speaker different words; X same
    word class as A but another speaker. Error when d(A,B) >= d(A,X)."""
    toks = [(c, f, t0, t1) for c, f, t0, t1 in tok_meta]

    def emb(tok):
        v = accessor.get(tok[1], tok[2], tok[3]).mean(axis=0)
        return v / (np.linalg.norm(v) + 1e-9)

    errors = total = 0
    attempts = 0
    while total < n_triples and attempts < 8000:
        attempts += 1
        a = toks[rng.randint(len(toks))]
        b_c = [t for t in toks if t[1] == a[1] and t[0] != a[0]]
        x_c = [t for t in toks if t[0] == a[0] and t[1] != a[1]]
        if not b_c or not x_c:
            continue
        b = b_c[rng.randint(len(b_c))]
        x = x_c[rng.randint(len(x_c))]
        ea, eb, ex = emb(a), emb(b), emb(x)
        errors += (1 - ea @ eb) >= (1 - ea @ ex)
        total += 1
    return errors / max(total, 1)


@pytest.mark.slow
def test_multitask_heads_specialize(tmp_path):
    feats_path, classes_path, spk_path, tok_meta = _make_corpus(tmp_path)
    rng = np.random.RandomState(0)

    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    lines = _pair_lines(tok_meta, rng)
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write("\n".join(lines[:360]) + "\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write("\n".join(lines[360:]) + "\n")

    net = SiameseMultitaskNetwork(
        input_dim=D, num_hidden_layers_shared=1, num_hidden_layers_spk=1,
        num_hidden_layers_phn=1, hidden_dim=64, output_dim=16,
        p_dropout=0.0, activation_layer="sigmoid",
        output_path=str(tmp_path / "network"))
    dl = MultiTaskDataLoader(pairs_path, feats_path,
                             fid2spk_file=spk_path, batch_size=32,
                             num_max_minibatches=24, seed=0,
                             align_backend="bank")
    loss = weighted_loss_multi(weight=0.3, loss_phn=coscos2(),
                               loss_spk=coscos2())
    trainer = TrainerSiameseMultitask(
        network=net, loss=loss, dataloader=dl, optimizer_type="adam",
        lr=0.005, num_epochs=40, patience=60,
        log_dir=str(tmp_path / "logs"), seed=0)
    trainer.train()
    assert trainer.train_losses[-1] < trainer.train_losses[0]

    emb = EmbedderSiameseMultitask(
        network=net, network_path=str(tmp_path / "network.pth"),
        feature_path=feats_path, output_path=str(tmp_path / "emb"),
        batch_size=1024)
    emb.embed()
    phn_acc, _, _ = read_feats(str(tmp_path / "emb") + ".phn")
    spk_acc, _, _ = read_feats(str(tmp_path / "emb") + ".spk")
    raw_acc, _, _ = read_feats(feats_path)

    word_raw = _abx_error(raw_acc, tok_meta, np.random.RandomState(0))
    word_phn = _abx_error(phn_acc, tok_meta, np.random.RandomState(0))
    spk_raw = _spk_abx_error(raw_acc, tok_meta, np.random.RandomState(0))
    spk_spk = _spk_abx_error(spk_acc, tok_meta, np.random.RandomState(0))
    print(f"word ABX: raw={word_raw:.3f} phn-head={word_phn:.3f} | "
          f"spk ABX: raw={spk_raw:.3f} spk-head={spk_spk:.3f}")
    # phn head must clearly beat raw features at across-speaker
    # word ABX
    assert word_phn < word_raw * 0.7
    # spk head keeps speaker identity at least as discriminable as raw
    # (raw features are speaker-dominated so raw spk ABX is already low)
    assert spk_spk < 0.4
