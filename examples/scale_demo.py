#!/usr/bin/env python3
"""Production-scale end-to-end run on one TPU chip.

Same pipeline as synthetic_demo.py but at the reference's canonical
scale: 280-dim stacked-fbank-like features, the buckeye-config network
(280 -> 2x500 sigmoid -> 100), a ~1.1k-token / ~8-speaker corpus,
HBM-resident bank training with K=8 chained dispatches (matrix-loss
alignment path), pipelined embedding export, and the in-framework ABX
evaluator over ALL token pairs on device. Prints per-stage wall times.

Usage: python examples/scale_demo.py [workdir]
(expects a TPU backend; finishes in a few minutes through the dev
tunnel — most of it remote compile + corpus upload)
"""

import os
import random
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from abnet3_tpu.dataloader import OriginalDataLoader
from abnet3_tpu.embedder import EmbedderSiamese
from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.sampler import SamplerClusterSiamese
from abnet3_tpu.trainer import TrainerSiamese
from abnet3_tpu.utils import read_feats

from synthetic_demo import abx_error, make_corpus  # noqa: E402

D = 280
N_CLASSES = 48
N_SPK = 8
TOKENS_PER_CLASS = 24
PROTO_LEN = 80


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/abnet3_scale"
    if os.path.exists(workdir):
        shutil.rmtree(workdir)
    os.makedirs(workdir)
    np.random.seed(0)
    random.seed(0)
    stages = {}

    t0 = time.time()
    print("== building synthetic corpus (%d tokens, %d-dim) =="
          % (N_CLASSES * TOKENS_PER_CLASS, D), flush=True)
    feats_path, classes_path, spk_path, tok_meta = make_corpus(
        workdir, d=D, n_classes=N_CLASSES, n_spk=N_SPK,
        tokens_per_class=TOKENS_PER_CLASS, proto_len=PROTO_LEN)
    stages["corpus build"] = time.time() - t0

    t0 = time.time()
    acc, _, _ = read_feats(feats_path)
    base_err = abx_error(acc, tok_meta, np.random.RandomState(0))
    stages["raw ABX proxy"] = time.time() - t0
    print(f"raw-feature across-speaker ABX-proxy error: {base_err:.3f}",
          flush=True)

    print("== sampling pairs ==", flush=True)
    t0 = time.time()
    pairs_dir = os.path.join(workdir, "pairs")
    SamplerClusterSiamese(
        std_file=classes_path, spkid_file=spk_path,
        directory_output=pairs_dir, seed=0, max_size_cluster=24,
        type_sampling_mode="log", spk_sampling_mode="log",
        num_total_sampled_pairs=60000).sample()
    stages["sampler"] = time.time() - t0

    print("== training (bank backend, K=8 chained matrix-loss steps) ==",
          flush=True)
    t0 = time.time()
    net = SiameseNetwork(input_dim=D, num_hidden_layers=2, hidden_dim=500,
                         output_dim=100, p_dropout=0.0,
                         activation_layer="sigmoid",
                         output_path=os.path.join(workdir, "network"))
    dl = OriginalDataLoader(pairs_dir, feats_path, batch_size=128,
                            num_max_minibatches=32, seed=0,
                            align_backend="bank", steps_per_call=8)
    trainer = TrainerSiamese(network=net, loss=coscos2(), dataloader=dl,
                             optimizer_type="adam", lr=0.001,
                             num_epochs=25, patience=30,
                             log_dir=os.path.join(workdir, "logs"),
                             seed=0)
    trainer.train()
    stages["training (25 epochs)"] = time.time() - t0
    print(f"loss {trainer.train_losses[0]:.4f} -> "
          f"{trainer.train_losses[-1]:.4f}", flush=True)

    print("== embedding export ==", flush=True)
    t0 = time.time()
    emb_path = os.path.join(workdir, "embeddings.h5f")
    EmbedderSiamese(network=net,
                    network_path=os.path.join(workdir, "network.pth"),
                    feature_path=feats_path, output_path=emb_path,
                    batch_size=4096).embed()
    stages["embedding export"] = time.time() - t0

    t0 = time.time()
    emb_acc, _, _ = read_feats(emb_path)
    trained_err = abx_error(emb_acc, tok_meta, np.random.RandomState(0))
    stages["ABX proxy eval (host)"] = time.time() - t0
    print(f"trained-embedding ABX-proxy error: {trained_err:.3f} "
          f"(raw: {base_err:.3f})", flush=True)
    assert trained_err < base_err, "training did not improve ABX"

    print("== framework ABX: all-pairs DTW distances on device ==",
          flush=True)
    from abnet3_tpu.eval import evaluate
    t0 = time.time()  # device-ABX stage only (not the proxy eval above)
    result = evaluate(emb_path, classes_path, spkid_file=spk_path,
                      task="across", distance="dtw_cos")
    stages["device ABX (all pairs)"] = time.time() - t0
    n_tok = N_CLASSES * TOKENS_PER_CLASS
    print(f"abnet3-abx across-speaker dtw_cos error: "
          f"{result['error']:.3f} over {result['n_triplets']} triplets "
          f"({result['n_cells']} cells, {n_tok * (n_tok - 1) // 2} "
          "token distances)", flush=True)
    assert result["error"] < base_err

    print("\n== stage wall times ==")
    for k, v in stages.items():
        print(f"  {k:24s} {v:7.1f}s")
    print("OK")


if __name__ == "__main__":
    main()
