#!/usr/bin/env python3
"""ZeroSpeech-scale ABX on one chip: full N x N token distance matrix +
across-speaker scoring, with per-stage wall-clock.

Synthesizes an STD-like token inventory (N tokens over C word classes x
S speakers, smooth formant-trajectory features of random length), then
drives the evaluator exactly as ``evaluate()`` does at scale:

1. TokenBank upload (one h2d of the padded corpus);
2. ``distance_matrix`` through the checkpointed TILES strategy — one
   jitted dispatch per (block x block) tile, uint16 wire codec, memmap
   + tile-log resume (kill the run mid-way and rerun the same command:
   completed tiles are skipped);
3. ``abx_error`` across-speaker scoring with the occupied-cell
   enumerator.

The reference delegated this entire stage to external ABXpy on CPU
(reference README.md:3, embedder.py:98-100); here the O(N^2) distance
work runs on the TPU. At N=30,000 that is ~450M DTW token pairs in
~465 tile dispatches (see eval/abx.py distance_matrix docstring).

Usage:
    python examples/abx_scale_run.py [--n 30000] [--classes 3000]
        [--speakers 20] [--dim 100] [--distance dtw_cos]
        [--checkpoint /tmp/abx30k.ckpt] [--out /tmp/abx_scale.json]
"""

import argparse
import json
import time

import numpy as np


def synth_corpus(n_tokens, n_classes, n_speakers, dim, t_min=48, t_max=96,
                 seed=0, noise=0.5):
    """STD-like inventory: class = a smooth trajectory through random
    waypoints, token = that trajectory resampled to a random length with
    a speaker offset + noise. Same recipe family as tests/test_quality.
    Returns ({id: (T, d) float32}, labels, speakers)."""
    rng = np.random.RandomState(seed)
    n_way = 4
    class_way = rng.randn(n_classes, n_way, dim).astype(np.float32) * 2.0
    spk_off = rng.randn(n_speakers, dim).astype(np.float32) * 0.8
    feats, labels, speakers = {}, [], []
    for i in range(n_tokens):
        c = i % n_classes
        s = rng.randint(n_speakers)
        T = rng.randint(t_min, t_max + 1)
        # piecewise-linear interpolation through the class waypoints
        pos = np.linspace(0, n_way - 1, T)
        lo = np.floor(pos).astype(int)
        hi = np.minimum(lo + 1, n_way - 1)
        frac = (pos - lo)[:, None].astype(np.float32)
        traj = class_way[c][lo] * (1 - frac) + class_way[c][hi] * frac
        feats[i] = (traj + spk_off[s]
                    + rng.randn(T, dim).astype(np.float32) * noise)
        labels.append(c)
        speakers.append(s)
    return feats, labels, speakers


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--classes", type=int, default=3000)
    ap.add_argument("--speakers", type=int, default=20)
    ap.add_argument("--dim", type=int, default=100)
    ap.add_argument("--distance", default="dtw_cos",
                    choices=("dtw_cos", "dtw_kl", "mean_cos"))
    ap.add_argument("--task", default="across",
                    choices=("across", "within"),
                    help="ABX task; 'within' bins per (ca, cx, speaker)"
                         " cell (device backend compacts its per-"
                         "speaker bin fetches to the occupied "
                         "submatrix)")
    ap.add_argument("--checkpoint", default=None,
                    help="resumable tile checkpoint path (memmap + log)")
    ap.add_argument("--score-backend", default="device",
                    choices=("host", "device"),
                    help="'device' scores triplets on the chip over the "
                         "device-resident matrix (bit-identical error; "
                         "without --checkpoint the tiles are never even "
                         "fetched to the host); 'host' is the numpy "
                         "occupied-cell scorer")
    ap.add_argument("--n-jobs", type=int, default=1,
                    help="host-backend scoring workers (fork pool)")
    ap.add_argument("--device-rows-per-block", type=int, default=None,
                    help="store the device matrix as equal-height row "
                         "blocks (single-chip > one-HBM-buffer layout; "
                         "auto past ABNET3_ABX_DEVMAT_GB = 6 GiB)")
    ap.add_argument("--crosscheck", type=int, default=0, metavar="K",
                    help="after the device-scored run, subsample K "
                         "tokens, fetch their submatrix off the device "
                         "matrix and assert the host scorer and the "
                         "device scorer agree bit-for-bit on it")
    ap.add_argument("--batch-size", type=int, default=1024,
                    help="tile-side cap (fetch-free runs size tiles "
                         "without the 2 MB fetch cap, so > 1024 takes "
                         "effect there)")
    ap.add_argument("--out", default=None, help="write stage timings JSON")
    ap.add_argument("--noise", type=float, default=0.5,
                    help="per-frame noise scale of the synthetic corpus "
                         "(larger -> classes overlap -> nonzero ABX)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from abnet3_tpu.eval.abx import abx_error, distance_matrix
    from abnet3_tpu.eval.abx_device import abx_error_device
    from abnet3_tpu.ops.bank import TokenBank

    stages = {}
    t0 = time.time()
    feats, labels, speakers = synth_corpus(args.n, args.classes,
                                           args.speakers, args.dim,
                                           seed=args.seed,
                                           noise=args.noise)
    stages["synth_s"] = round(time.time() - t0, 1)
    print(f"[synth] {args.n} tokens, {args.classes} classes x "
          f"{args.speakers} speakers, d={args.dim}: {stages['synth_s']}s")

    t0 = time.time()
    bank = TokenBank(feats)
    # scalar fetch, not block_until_ready: the axon tunnel's block can
    # return before the transfer completes (CLAUDE.md), which would
    # charge the upload tail to the distance stage's timing
    float(bank.bank[0, 0, 0])
    stages["bank_upload_s"] = round(time.time() - t0, 1)
    gb = bank.nbytes / 1e9
    print(f"[bank] ({len(bank)}, {bank.max_len}, {bank.dim}) = {gb:.2f} GB "
          f"uploaded in {stages['bank_upload_s']}s")

    use_device = args.score_backend == "device"
    t0 = time.time()
    result = distance_matrix(bank, distance=args.distance,
                             checkpoint_path=args.checkpoint,
                             strategy="tiles", device_out=use_device,
                             batch_size=args.batch_size,
                             device_rows_per_block=(
                                 args.device_rows_per_block
                                 if use_device else None),
                             # without a checkpoint a device-scored run
                             # never fetches the tiles at all
                             host_out=(not use_device
                                       or args.checkpoint is not None))
    D, handle = result if use_device else (result, None)
    if handle is not None and D is None:
        # fetch-free mode: force the in-flight tail so the distance
        # stage's clock covers its own work (value probe on EVERY
        # storage block, not block_until_ready — the axon block can
        # return early)
        for blk in handle.blocks:
            np.asarray(blk[:1, :1])
    stages["distance_s"] = round(time.time() - t0, 1)
    if handle is not None and len(handle.blocks) > 1:
        hb = handle.blocks
        where = ("host-resident (lazy: staged one block at a time)"
                 if handle.lazy else "device-resident")
        print(f"[matrix] {len(hb)} row blocks x "
              f"({hb[0].shape[0]}, {hb[0].shape[1]}) "
              f"{np.dtype(hb[0].dtype).name} = "
              f"{sum(b.nbytes for b in hb) / 1e9:.2f} GB {where}")
    n_pairs = args.n * (args.n - 1) // 2
    print(f"[distance] {n_pairs / 1e6:.1f}M token pairs ({args.distance}, "
          f"tiles) in {stages['distance_s']}s = "
          f"{n_pairs / max(stages['distance_s'], 1e-9) / 1e3:.0f}k pairs/s "
          "incl. compile"
          + (" (fetch-free: tiles stayed on device)" if D is None else ""))

    t0 = time.time()
    if use_device:
        res = abx_error_device(handle, labels, speakers, task=args.task)
    else:
        res = abx_error(D, labels, speakers, task=args.task,
                        n_jobs=args.n_jobs)
    stages["score_s"] = round(time.time() - t0, 1)
    if res["n_cells"] == 0:
        print(f"[score] WARNING: 0 occupied cells — with --task within "
              f"every (class, speaker) needs >= 2 tokens; at --n "
              f"{args.n} / --classes {args.classes} / --speakers "
              f"{args.speakers} the expected tokens per (c, s) is "
              f"{args.n / (args.classes * args.speakers):.2f}; raise "
              "--n or shrink --classes/--speakers")
    print(f"[score] {args.task}-speaker ABX {res['error']:.4f} over "
          f"{res['n_triplets']:,} triplets / {res['n_cells']:,} cells "
          f"in {stages['score_s']}s")

    if args.crosscheck and handle is not None:
        import jax
        t0 = time.time()
        rng = np.random.RandomState(args.seed + 1)
        sub = np.sort(rng.choice(args.n, size=min(args.crosscheck,
                                                  args.n),
                                 replace=False)).astype(np.int32)
        # gather the subsampled wire submatrix off the device blocks
        # (block-local row picks, global column picks; <= 2 MB fetches)
        take = jax.jit(lambda B, r, c: B[r][:, c])
        parts = []
        rows_pb = handle.rows_per_block
        for b, blk in enumerate(handle.blocks):
            lo = handle.row_starts[b]
            loc = sub[(sub >= lo) & (sub < lo + rows_pb)] - lo
            if len(loc):
                parts.append(np.asarray(
                    take(blk, jax.device_put(loc), jax.device_put(sub))))
        D_sub = np.concatenate(parts, axis=0)
        from abnet3_tpu.eval.abx_device import upload_matrix
        labels_s = [labels[i] for i in sub]
        spk_s = [speakers[i] for i in sub]
        wire_f32 = (D_sub.astype(np.float32) / np.float32(65535.0)
                    if D_sub.dtype == np.uint16
                    else D_sub.astype(np.float32))
        h = abx_error(wire_f32, labels_s, spk_s, task=args.task)
        dv = abx_error_device(upload_matrix(D_sub), labels_s, spk_s,
                              task=args.task)
        assert dv["error"] == h["error"], (dv, h)
        assert dv["n_triplets"] == h["n_triplets"]
        stages["crosscheck_s"] = round(time.time() - t0, 1)
        stages["crosscheck_n"] = int(len(sub))
        print(f"[crosscheck] host == device bit-identical on a "
              f"{len(sub)}-token subsample (ABX {h['error']:.4f}, "
              f"{h['n_triplets']:,} triplets) in "
              f"{stages['crosscheck_s']}s")

    stages.update(n=args.n, distance=args.distance, task=args.task,
                  abx=res["error"],
                  n_triplets=res["n_triplets"],
                  score_backend=args.score_backend)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(stages, fh, indent=1)
        print(f"[out] {args.out}")


if __name__ == "__main__":
    main()
