#!/usr/bin/env python3
"""Beyond-toy tower benchmark (round-5 VERDICT #8): train and embed a
280 -> 4x2048 -> 512 siamese tower through the SAME production step the
flagship 2x500 model uses, on real hardware, and report frame-pairs/s +
MFU. Evidence the framework's perf story is not specific to the small
reference MLP (reference test/data/buckeye.yaml model block is the
baseline shape).

The recipe is bench.py's bench_ours exactly (TokenBank corpus resident
in HBM, K-chained optimizer steps per dispatch, matrix-loss alignment,
distinct id-batch variants so the tunnel replay cache never hits, every
timed region fetch-terminated), with the tower dims as flags.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python examples/big_tower_bench.py
        [--hidden 2048] [--layers 4] [--out-dim 512] [--steps-per-call 8]
        [--n-calls 12] [--json runs/big_tower.json]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--in-dim", type=int, default=280)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--out-dim", type=int, default=512)
    ap.add_argument("--b-same", type=int, default=64)
    ap.add_argument("--b-diff", type=int, default=64)
    ap.add_argument("--t", type=int, default=96)
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--n-calls", type=int, default=12)
    ap.add_argument("--embed-chunks", type=int, default=24,
                    help="forward-only embed chunks of 4096 frames to "
                         "time after training (0 skips)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import bench  # repo-root bench.py: shared recipe + MFU conventions
    bench.DIM_IN, bench.HID, bench.OUT = (args.in_dim, args.hidden,
                                          args.out_dim)
    bench.B_SAME, bench.B_DIFF, bench.T = (args.b_same, args.b_diff,
                                           args.t)

    import jax
    import optax
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.ops.bank import TokenBank
    from abnet3_tpu.parallel import make_mesh, make_split_pair_train_step

    B_SAME, B_DIFF, T = args.b_same, args.b_diff, args.t
    batch = bench._make_batch()
    frames = bench._frames_in_batch(batch)
    f1s, f2s, n1s, n2s, f1d, f2d, n1d, n2d = batch
    token_feats = {}
    for g, (f, n) in enumerate(((f1s, n1s), (f2s, n2s), (f1d, n1d),
                                (f2d, n2d))):
        for b in range(f.shape[0]):
            token_feats[(g, b)] = f[b, :n[b]]
    bank = TokenBank(token_feats)
    K = args.steps_per_call
    rng_ids = np.random.RandomState(7)
    variants = []
    ws = jax.device_put(np.ones((K, B_SAME), np.float32))
    wd = jax.device_put(np.ones((K, B_DIFF), np.float32))
    for _ in range(4):
        ids = []
        for ga, gb, nb in ((0, 1, B_SAME), (2, 3, B_DIFF)):
            perm = rng_ids.permutation(nb)
            for g in (ga, gb):
                flat = bank.ids([(g, b) for b in perm])
                ids.append(jax.device_put(np.tile(flat, (K, 1))))
        variants.append((ids[0], ids[1], ws, ids[2], ids[3], wd))

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=args.in_dim,
                         num_hidden_layers=args.layers,
                         hidden_dim=args.hidden, output_dim=args.out_dim,
                         p_dropout=0.0, activation_layer="relu")
    params, state = net.init_params(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(params))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    loss = coscos2()
    step, _ = make_split_pair_train_step(net, loss, optimizer, bank,
                                         mesh, steps_per_call=K)
    rng = jax.random.PRNGKey(0)

    t_c = time.perf_counter()
    for i in range(max(30 // K, 4)):
        params, state, opt_state, value = step(
            params, state, opt_state, rng, *variants[i % 4])
    float(value)  # fetch: block_until_ready can lie on this tunnel
    warm_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for i in range(args.n_calls):
        params, state, opt_state, value = step(
            params, state, opt_state, rng, *variants[i % 4])
    v = float(value)  # fetch INSIDE the timed region
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    sps = args.n_calls * K / dt

    # analytic FLOPs at these dims (bench.py conventions: matmul terms
    # + DTW DP; conservative)
    mm = (args.in_dim * args.hidden
          + (args.layers - 1) * args.hidden * args.hidden
          + args.hidden * args.out_dim)
    fr = (B_SAME + B_DIFF) * 2 * T
    step_fl = (6.0 * mm * fr
               + B_SAME * (2.0 * T * T * args.in_dim + 20.0 * T * T)
               + B_SAME * 6.0 * T * T * args.out_dim)
    peak, chip = bench._chip_peak_flops()
    res = {
        "metric": (f"big-tower train throughput/chip: "
                   f"{args.in_dim}->{args.layers}x{args.hidden}->"
                   f"{args.out_dim} ({n_params / 1e6:.1f}M params), "
                   "full production step (align+fwd+bwd+update, "
                   f"K={K} chained)"),
        "value": round(sps * frames, 1),
        "unit": "frame-pairs/s",
        "steps_per_s": round(sps, 2),
        "mfu": round(sps * step_fl / peak, 5),
        "chip": chip,
        "warmup_s": round(warm_s, 1),
        "loss": round(v, 6),
    }
    print(json.dumps(res), flush=True)

    if args.embed_chunks:
        from abnet3_tpu.embedder import encode_transfer
        import jax.numpy as jnp
        CH = 4096

        @jax.jit
        def fwd(p, x):
            out, _ = net.forward_once(p, state, x, train=False)
            return encode_transfer(out, "int8")

        @jax.jit
        def chunk_fn(k):
            return jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(1), k),
                (CH, args.in_dim), jnp.float32)

        chunks = [chunk_fn(k) for k in range(args.embed_chunks)]
        for c in chunks:
            float(c[0, 0])
        head = fwd(params, chunks[0])
        float(np.asarray(head[0])[0, 0])  # compile + warm, fetched
        t0 = time.perf_counter()
        outs = [fwd(params, chunks[k]) for k in range(args.embed_chunks)]
        last = outs[-1]
        np.asarray(last[0])  # fetch-terminate
        dt = time.perf_counter() - t0
        fps = args.embed_chunks * CH / dt
        emb = {
            "metric": "big-tower forward-only embed (device-resident, "
                      "int8-encoded, 4096-frame chunks)",
            "value": round(fps, 1),
            "unit": "frames/s",
            "mfu": round(fps * 2.0 * mm / peak, 5),
        }
        print(json.dumps(emb), flush=True)
        res["embed"] = emb

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(res, fh, indent=1)


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
