"""End-to-end learning quality: ABX-style discriminability improves.

Synthetic ZeroSpeech-like corpus: word classes are prototype trajectories;
tokens are time-warped, speaker-shifted, noisy instances. The full pipeline
(sampler -> bank dataloader -> siamese trainer -> embedder) must produce
embeddings whose ABX-proxy error beats the raw input features — the
framework's analogue of the reference's quality metric of record
(ABX discriminability, SURVEY §6)."""

import os

import numpy as np
import pytest

from abnet3_tpu.dataloader import OriginalDataLoader
from abnet3_tpu.embedder import EmbedderSiamese
from abnet3_tpu.io import read_h5features, write_h5features
from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.sampler import SamplerClusterSiamese
from abnet3_tpu.trainer import TrainerSiamese

D = 12
N_CLASSES = 5
N_SPK = 4
TOKENS_PER_CLASS = 8
PROTO_LEN = 20


def _make_corpus(tmp_path, seed=0):
    rng = np.random.RandomState(seed)
    protos = [np.cumsum(rng.randn(PROTO_LEN, D), axis=0)
              for _ in range(N_CLASSES)]
    # large speaker offsets: raw-feature distances are dominated by
    # speaker identity, which is exactly the nuisance ABnet removes
    spk_offsets = [rng.randn(D) * 6.0 for _ in range(N_SPK)]

    files = {f"spk{s}_f": [] for s in range(N_SPK)}
    classes_lines = []
    tok_meta = []  # (class, file, t0, t1)
    cursor = {f: 0 for f in files}
    for c in range(N_CLASSES):
        classes_lines.append(f"{c} word{c}")
        for k in range(TOKENS_PER_CLASS):
            s = rng.randint(N_SPK)
            fname = f"spk{s}_f"
            # time warp: resample prototype to a jittered length
            L = rng.randint(PROTO_LEN - 6, PROTO_LEN + 7)
            idx = np.linspace(0, PROTO_LEN - 1, L)
            warped = np.stack([np.interp(idx, np.arange(PROTO_LEN),
                                         protos[c][:, d])
                               for d in range(D)], axis=1)
            token = warped + spk_offsets[s] + rng.randn(L, D) * 0.3
            start_frame = cursor[fname]
            files[fname].append(token.astype(np.float32))
            # silence gap
            files[fname].append(np.zeros((5, D), np.float32))
            t0 = start_frame * 0.01 + 0.0025
            t1 = (start_frame + L - 1) * 0.01 + 0.0025
            classes_lines.append(f"{fname} {t0:.4f} {t1:.4f}")
            tok_meta.append((c, fname, t0, t1))
            cursor[fname] += L + 5
        classes_lines.append("")

    feats_path = str(tmp_path / "feats.h5f")
    items, feats, times = [], [], []
    for fname, chunks in files.items():
        mat = np.vstack(chunks)
        items.append(fname)
        feats.append(mat)
        times.append(np.arange(len(mat)) * 0.01 + 0.0025)
    write_h5features(feats_path, "features", items, times, feats)

    classes_path = str(tmp_path / "words.classes")
    with open(classes_path, "w") as fh:
        fh.write("\n".join(classes_lines) + "\n")
    spk_path = str(tmp_path / "spk.txt")
    with open(spk_path, "w") as fh:
        for s in range(N_SPK):
            fh.write(f"spk{s}_f spk{s}\n")
    return feats_path, classes_path, spk_path, tok_meta


def _abx_error(accessor, tok_meta, rng):
    """Across-speaker ABX proxy: A and B are same-class tokens from
    *different* speakers; X is a different-class token from A's speaker.
    Error when d(A,B) >= d(A,X) on mean-pooled cosine distance — raw
    features fail this because speaker identity dominates."""
    by_class = {}
    for c, f, t0, t1 in tok_meta:
        by_class.setdefault(c, []).append((f, t0, t1))

    def emb(tok):
        f, t0, t1 = tok
        mat = accessor.get(f, t0, t1)
        v = mat.mean(axis=0)
        return v / (np.linalg.norm(v) + 1e-9)

    errors, total = 0, 0
    classes = list(by_class)
    attempts = 0
    while total < 300 and attempts < 5000:
        attempts += 1
        ca, cx = rng.choice(classes, 2, replace=False)
        toks_a = by_class[ca]
        a = toks_a[rng.randint(len(toks_a))]
        b_cands = [t for t in toks_a if t[0] != a[0]]
        x_cands = [t for t in by_class[cx] if t[0] == a[0]]
        if not b_cands or not x_cands:
            continue
        b = b_cands[rng.randint(len(b_cands))]
        x = x_cands[rng.randint(len(x_cands))]
        ea, eb, ex = emb(a), emb(b), emb(x)
        d_ab = 1 - ea @ eb
        d_ax = 1 - ea @ ex
        errors += d_ab >= d_ax
        total += 1
    return errors / max(total, 1)


@pytest.mark.slow
def test_pipeline_improves_abx(tmp_path):
    feats_path, classes_path, spk_path, tok_meta = _make_corpus(tmp_path)

    # baseline ABX on raw features
    from abnet3_tpu.utils import read_feats
    acc, _, _ = read_feats(feats_path)
    rng = np.random.RandomState(0)
    baseline_err = _abx_error(acc, tok_meta, rng)

    # sample pairs
    np.random.seed(0)
    import random as pyrandom
    pyrandom.seed(0)
    pairs_dir = str(tmp_path / "pairs")
    sampler = SamplerClusterSiamese(
        std_file=classes_path, spkid_file=spk_path,
        directory_output=pairs_dir, seed=0, max_size_cluster=20,
        ratio_train_dev=0.7, ratio_same_diff_spk=0.5,
        ratio_same_diff_type=0.5, type_sampling_mode="log",
        spk_sampling_mode="log", num_total_sampled_pairs=600)
    sampler.sample()

    # train
    net = SiameseNetwork(input_dim=D, num_hidden_layers=2, hidden_dim=64,
                         output_dim=16, p_dropout=0.0,
                         activation_layer="sigmoid",
                         output_path=str(tmp_path / "network"))
    dl = OriginalDataLoader(pairs_dir, feats_path, batch_size=16,
                            num_max_minibatches=8, seed=0,
                            align_backend="bank")
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.005,
                             num_epochs=25, patience=30,
                             log_dir=str(tmp_path / "logs"), seed=0)
    trainer.train()
    assert trainer.train_losses[-1] < trainer.train_losses[0]

    # embed + ABX on embeddings
    emb_path = str(tmp_path / "emb.h5f")
    EmbedderSiamese(network=net,
                    network_path=str(tmp_path / "network.pth"),
                    feature_path=feats_path, output_path=emb_path,
                    batch_size=512).embed()
    emb_acc, _, _ = read_feats(emb_path)
    rng = np.random.RandomState(0)
    trained_err = _abx_error(emb_acc, tok_meta, rng)

    print(f"ABX-proxy error: raw={baseline_err:.3f} "
          f"trained={trained_err:.3f}")
    # the trained embedding must clearly improve across-speaker
    # discriminability over raw features
    assert trained_err < baseline_err
    assert trained_err < baseline_err * 0.7
