#!/usr/bin/env python3
"""End-to-end demo on a synthetic ZeroSpeech-like corpus.

Builds word-class prototype trajectories with speaker offsets + time
warping, then runs the full framework: SamplerClusterSiamese pair
sampling -> HBM-resident bank training (TrainerSiamese) -> embedding
export -> across-speaker ABX-proxy evaluation of raw features vs learned
embeddings.

Usage: python examples/synthetic_demo.py [workdir]
(runs on whatever jax backend is available; a TPU finishes in seconds)
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from abnet3_tpu.dataloader import OriginalDataLoader
from abnet3_tpu.embedder import EmbedderSiamese
from abnet3_tpu.io import write_h5features
from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.sampler import SamplerClusterSiamese
from abnet3_tpu.trainer import TrainerSiamese
from abnet3_tpu.utils import read_feats

D = 24
N_CLASSES = 12
N_SPK = 6
TOKENS_PER_CLASS = 12
PROTO_LEN = 30


def make_corpus(workdir, seed=0, d=None, n_classes=None, n_spk=None,
                tokens_per_class=None, proto_len=None):
    d = D if d is None else d
    n_classes = N_CLASSES if n_classes is None else n_classes
    n_spk = N_SPK if n_spk is None else n_spk
    tokens_per_class = (TOKENS_PER_CLASS if tokens_per_class is None
                        else tokens_per_class)
    proto_len = PROTO_LEN if proto_len is None else proto_len
    rng = np.random.RandomState(seed)
    protos = [np.cumsum(rng.randn(proto_len, d), axis=0)
              for _ in range(n_classes)]
    spk_offsets = [rng.randn(d) * 6.0 for _ in range(n_spk)]
    files = {f"spk{s}_f": [] for s in range(n_spk)}
    cursor = {f: 0 for f in files}
    classes_lines, tok_meta = [], []
    for c in range(n_classes):
        classes_lines.append(f"{c} word{c}")
        for _ in range(tokens_per_class):
            s = rng.randint(n_spk)
            fname = f"spk{s}_f"
            L = rng.randint(proto_len - 8, proto_len + 9)
            idx = np.linspace(0, proto_len - 1, L)
            warped = np.stack([np.interp(idx, np.arange(proto_len),
                                         protos[c][:, dd])
                               for dd in range(d)], axis=1)
            token = warped + spk_offsets[s] + rng.randn(L, d) * 0.3
            t0 = cursor[fname] * 0.01 + 0.0025
            t1 = (cursor[fname] + L - 1) * 0.01 + 0.0025
            files[fname].append(token.astype(np.float32))
            files[fname].append(np.zeros((5, d), np.float32))
            cursor[fname] += L + 5
            classes_lines.append(f"{fname} {t0:.4f} {t1:.4f}")
            tok_meta.append((c, fname, t0, t1))
        classes_lines.append("")

    feats_path = os.path.join(workdir, "feats.h5f")
    items, feats, times = [], [], []
    for fname, chunks in files.items():
        mat = np.vstack(chunks)
        items.append(fname)
        feats.append(mat)
        times.append(np.arange(len(mat)) * 0.01 + 0.0025)
    write_h5features(feats_path, "features", items, times, feats)
    classes_path = os.path.join(workdir, "words.classes")
    with open(classes_path, "w") as fh:
        fh.write("\n".join(classes_lines) + "\n")
    spk_path = os.path.join(workdir, "spk.txt")
    with open(spk_path, "w") as fh:
        for s in range(n_spk):
            fh.write(f"spk{s}_f spk{s}\n")
    return feats_path, classes_path, spk_path, tok_meta


def abx_error(accessor, tok_meta, rng, n_triples=1000):
    by_class = {}
    for c, f, t0, t1 in tok_meta:
        by_class.setdefault(c, []).append((f, t0, t1))

    def emb(tok):
        v = accessor.get(*tok).mean(axis=0)
        return v / (np.linalg.norm(v) + 1e-9)

    errors = total = attempts = 0
    classes = list(by_class)
    while total < n_triples:
        attempts += 1
        if attempts > 100 * n_triples:
            # a corpus where no class spans two files never yields a
            # valid across-file triplet — fail loudly, don't spin
            raise ValueError(
                "could not assemble %d across-file ABX triplets after "
                "%d draws — does any class span two files?"
                % (n_triples, attempts))
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
        errors += (1 - ea @ eb) >= (1 - ea @ ex)
        total += 1
    return errors / total


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/abnet3_demo"
    if os.path.exists(workdir):  # h5features writes append; sampler
        import shutil            # output dirs must not pre-exist
        shutil.rmtree(workdir)
    os.makedirs(workdir)
    np.random.seed(0)
    random.seed(0)

    print("== building synthetic corpus ==")
    feats_path, classes_path, spk_path, tok_meta = make_corpus(workdir)
    acc, _, _ = read_feats(feats_path)
    base_err = abx_error(acc, tok_meta, np.random.RandomState(0))
    print(f"raw-feature across-speaker ABX-proxy error: {base_err:.3f}")

    print("== sampling pairs ==")
    pairs_dir = os.path.join(workdir, "pairs")
    SamplerClusterSiamese(
        std_file=classes_path, spkid_file=spk_path,
        directory_output=pairs_dir, seed=0, max_size_cluster=20,
        type_sampling_mode="log", spk_sampling_mode="log",
        num_total_sampled_pairs=3000).sample()

    print("== training (HBM-resident bank, fused steps) ==")
    net = SiameseNetwork(input_dim=D, num_hidden_layers=2, hidden_dim=128,
                         output_dim=32, p_dropout=0.0,
                         activation_layer="sigmoid",
                         output_path=os.path.join(workdir, "network"))
    dl = OriginalDataLoader(pairs_dir, feats_path, batch_size=64,
                            num_max_minibatches=16, seed=0,
                            align_backend="bank")
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.003,
                             num_epochs=30, patience=40,
                             log_dir=os.path.join(workdir, "logs"), seed=0)
    t0 = time.time()
    trainer.train()
    print(f"training took {time.time() - t0:.1f}s "
          f"(loss {trainer.train_losses[0]:.4f} -> "
          f"{trainer.train_losses[-1]:.4f})")

    print("== embedding ==")
    emb_path = os.path.join(workdir, "embeddings.h5f")
    EmbedderSiamese(network=net,
                    network_path=os.path.join(workdir, "network.pth"),
                    feature_path=feats_path, output_path=emb_path,
                    batch_size=2048).embed()
    emb_acc, _, _ = read_feats(emb_path)
    trained_err = abx_error(emb_acc, tok_meta, np.random.RandomState(0))
    print(f"trained-embedding ABX-proxy error: {trained_err:.3f} "
          f"(raw: {base_err:.3f})")
    assert trained_err < base_err, "training did not improve ABX"

    print("== framework ABX (batched DTW distances on device) ==")
    from abnet3_tpu.eval import evaluate
    result = evaluate(emb_path, classes_path, spkid_file=spk_path,
                      task="across", distance="dtw_cos")
    print(f"abnet3-abx across-speaker dtw_cos error: "
          f"{result['error']:.3f} over {result['n_triplets']} triplets "
          f"({result['n_cells']} cells)")
    assert result["error"] < 0.45, "framework ABX disagrees with proxy"
    print("OK")


if __name__ == "__main__":
    main()
