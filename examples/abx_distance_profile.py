#!/usr/bin/env python3
"""Profile the ABX tile distance stage (round-5 VERDICT #7): split a
tile's wall time into compile / dispatch (enqueue) / kernel execution /
drain, then micro-time the two in-kernel terms — the anchor-form
distance einsum and the path-stats DP — to name the dominant one.

All timings follow the repo's fetch-termination rule (bench.py header:
block_until_ready can return early on this tunnel; every timed region
ends in a value fetch). Micro benches vary their inputs per call so the
tunnel's replay cache never serves a timing.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python \
        examples/abx_distance_profile.py [--n 4096] [--t 96] [--d 100]
        [--json runs/abx_profile.json] [--rows-kernel | --scan]
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--t", type=int, default=96)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--warm-tiles", type=int, default=3)
    ap.add_argument("--timed-tiles", type=int, default=6)
    ap.add_argument("--micro-iters", type=int, default=3,
                    help="chained scan sweeps per micro benchmark")
    ap.add_argument("--backend", choices=("rows", "scan"),
                    default="rows",
                    help="stats backend to profile (rows = the Pallas "
                         "row-streaming kernel; scan = the XLA scan)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # force the chosen backend BEFORE importing the dispatchers
    if args.backend == "rows":
        os.environ["ABNET3_PALLAS_TILES_MIN"] = "0"
    else:
        os.environ["ABNET3_PALLAS_TILES_MIN"] = "999999999"

    import jax
    import jax.numpy as jnp
    from abnet3_tpu.eval import abx as abx_mod
    from abnet3_tpu.ops.bank import TokenBank
    from abnet3_tpu.ops.dtw import anchor_angular_distance_rows

    rng = np.random.RandomState(args.seed)
    T, d, block = args.t, args.d, args.block
    feats = {i: rng.randn(rng.randint(T // 2, T + 1), d)
             .astype(np.float32) for i in range(args.n)}
    bank = TokenBank(feats, max_frames=T)
    float(bank.bank[0, 0, 0])
    prof = {"backend": args.backend, "n": args.n, "T": T, "d": d,
            "block": block}

    # ---- tile executable: compile / enqueue / execute split ----------
    # reproduce distance_matrix's tile closure via its own module (the
    # production code path), but drive single tiles by hand
    view = bank.view()
    ids = [jnp.asarray(np.arange(t0, t0 + block, dtype=np.int32) % args.n)
           for t0 in range(0, args.n, block)]

    # build the production tile function through distance_matrix on a
    # tiny run is awkward (it drains internally); instead call the same
    # ops it composes, matching eval/abx.py tile_impl exactly
    from abnet3_tpu.ops.dtw import path_stats_backend
    sel = path_stats_backend((block, T, T)) \
        if args.backend == "rows" else "scan"
    prof["stats_backend_selected"] = sel

    if sel == "pallas":
        from abnet3_tpu.ops.pallas_dtw import dtw_path_stats_rows_pallas

        @jax.jit
        def tile_impl(bv, ids_i, ids_j):
            fj, nj = bv.take(ids_j, T)

            def row(_, ids_g):
                fi, ni = bv.take(ids_g, T)
                dist_rows = anchor_angular_distance_rows(fi[0], fj)
                n1 = jnp.broadcast_to(ni, (block,))
                psum, plen = dtw_path_stats_rows_pallas(dist_rows, n1, nj)
                return None, (psum / jnp.maximum(plen, 1.0))[None]

            _, rows = jax.lax.scan(row, None, ids_i.reshape(block, 1))
            return abx_mod._encode_tile_u16(rows.reshape(block, block))
    else:
        from abnet3_tpu.ops.dtw import (dtw_path_stats_auto,
                                        pairwise_angular_distance)

        @jax.jit
        def tile_impl(bv, ids_i, ids_j):
            fj, nj = bv.take(ids_j, T)

            def row(_, ids_g):
                fi, ni = bv.take(ids_g, T)
                f1 = jnp.broadcast_to(fi[:, None], (1, block, T, d)) \
                    .reshape(block, T, d)
                n1 = jnp.broadcast_to(ni[:, None], (1, block)).reshape(-1)
                dist = pairwise_angular_distance(f1, fj)
                psum, plen = dtw_path_stats_auto(dist, n1, nj)
                return None, (psum / jnp.maximum(plen, 1.0)).reshape(1, block)

            _, rows = jax.lax.scan(row, None, ids_i.reshape(block, 1))
            return abx_mod._encode_tile_u16(rows.reshape(block, block))

    t0 = time.time()
    out = tile_impl(view, ids[0], ids[1 % len(ids)])
    float(np.asarray(out[:1, :1])[0, 0])
    prof["compile_plus_first_tile_s"] = round(time.time() - t0, 1)
    print(f"[compile] first tile incl. compile: "
          f"{prof['compile_plus_first_tile_s']}s")

    for w in range(args.warm_tiles):
        out = tile_impl(view, ids[w % len(ids)], ids[(w + 1) % len(ids)])
    float(np.asarray(out[:1, :1])[0, 0])

    enq = []
    t0 = time.time()
    for k in range(args.timed_tiles):
        te = time.time()
        out = tile_impl(view, ids[k % len(ids)],
                        ids[(k + 2) % len(ids)])
        enq.append(time.time() - te)
    float(np.asarray(out[:1, :1])[0, 0])  # fetch-terminate
    wall = time.time() - t0
    prof["warm_tile_s"] = round(wall / args.timed_tiles, 3)
    prof["enqueue_s_mean"] = round(float(np.mean(enq)), 4)
    print(f"[tile] warm {prof['warm_tile_s']}s/tile "
          f"(enqueue {prof['enqueue_s_mean']}s) over "
          f"{args.timed_tiles} fetch-free tiles")

    # drain cost: same tiles but with the 2 MB u16 fetch per tile
    for k in range(args.timed_tiles):
        out = tile_impl(view, ids[k % len(ids)], ids[(k + 2) % len(ids)])
    np.asarray(out[:1, :1])
    t0 = time.time()
    for k in range(args.timed_tiles):
        out = tile_impl(view, ids[k % len(ids)], ids[(k + 2) % len(ids)])
        np.asarray(out)  # synchronous tile fetch (worst-case drain)
    wall_f = time.time() - t0
    prof["warm_tile_fetched_s"] = round(wall_f / args.timed_tiles, 3)
    print(f"[tile+fetch] {prof['warm_tile_fetched_s']}s/tile with a "
          "synchronous u16 tile fetch (production overlaps these)")

    # ---- micro: einsum-only vs DP-only -------------------------------
    # einsum-only: the anchor-form distance rows for every row of a
    # tile, reduced to a scalar (keeps HBM writes out of the
    # comparison); input scaled per call so no replay
    @jax.jit
    def einsum_only(bv, ids_i, ids_j, scale):
        fj, nj = bv.take(ids_j, T)

        def row(c, ids_g):
            fi, _ = bv.take(ids_g, T)
            dist_rows = anchor_angular_distance_rows(fi[0] * scale, fj)
            # full reduction: a sliced reduce would let XLA narrow the
            # einsum to a matvec and the timing would measure nothing
            return c + jnp.sum(dist_rows), None

        c, _ = jax.lax.scan(row, jnp.float32(0),
                            ids_i.reshape(block, 1))
        return c

    c = einsum_only(view, ids[0], ids[1 % len(ids)], jnp.float32(1.0))
    float(c)
    t0 = time.time()
    for it in range(args.micro_iters):
        c = einsum_only(view, ids[it % len(ids)],
                        ids[(it + 1) % len(ids)],
                        jnp.float32(1.0 + 1e-6 * it))
    float(c)
    prof["einsum_only_tile_s"] = round(
        (time.time() - t0) / args.micro_iters, 3)
    print(f"[micro] einsum-only (block rows of anchor distances): "
          f"{prof['einsum_only_tile_s']}s/tile-equivalent")

    if sel == "pallas":
        from abnet3_tpu.ops.pallas_dtw import dtw_path_stats_rows_pallas

        @jax.jit
        def dp_only(dist_rows, n1, n2, scale):
            def row(c, i):
                # per-step input variation: an identical body would let
                # XLA hoist ONE kernel call out of the scan
                psum, plen = dtw_path_stats_rows_pallas(
                    dist_rows * (scale + 1e-9 * i.astype(jnp.float32)),
                    n1, n2)
                return c + jnp.sum(psum / jnp.maximum(plen, 1.0)), None

            c, _ = jax.lax.scan(row, jnp.float32(0),
                                jnp.arange(block, dtype=jnp.int32))
            return c

        dr = jnp.asarray(rng.rand(T, block, T).astype(np.float32))
        n1 = jnp.full((block,), T, jnp.int32)
        n2 = jnp.asarray(rng.randint(T // 2, T + 1, block)
                         .astype(np.int32))
        c = dp_only(dr, n1, n2, jnp.float32(1.0))
        float(c)
        t0 = time.time()
        for it in range(args.micro_iters):
            c = dp_only(dr, n1, n2, jnp.float32(1.0 + 1e-6 * it))
        float(c)
        prof["dp_only_tile_s"] = round(
            (time.time() - t0) / args.micro_iters, 3)
        print(f"[micro] DP-only (block Pallas rows-DP calls): "
              f"{prof['dp_only_tile_s']}s/tile-equivalent")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(prof, fh, indent=1)
        print(f"[out] {args.json}")


if __name__ == "__main__":
    main()
