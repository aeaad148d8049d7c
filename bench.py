#!/usr/bin/env python3
"""Benchmarks: siamese training throughput (aligned frame pairs/sec/chip)
and embedding-export throughput (embedded frames/sec/chip).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per
benchmark; the headline train metric prints FIRST (driver compatibility),
the embed metric second (BASELINE.json north-star #1).

Metric: frame pairs per second through one FULL training step of the
canonical ABnet3 network (280 -> 2x500 sigmoid -> 100, the reference's
buckeye config) on a batch of 64 same-word + 64 diff-word token pairs:
cosine-distance matrices + DTW alignment + frame gather + both siamese
towers forward/backward + adam update. In this framework that entire step
is one jitted XLA computation on the TPU (ops/dtw.py + parallel/mesh.py).

Baseline: the reference's architecture measured on this machine — per-pair
host DTW over a numpy cosine-distance matrix (row-vectorized numpy DP,
i.e. at least as fast as the reference's per-pair Cython DTW,
reference dataloader.py:183-231) followed by a torch-CPU siamese
forward/backward + adam step on the assembled batch
(reference trainer.py:226-242). vs_baseline = ours / baseline.
"""

import json
import time

import numpy as np

# TIMING RULE for this environment: through the axon tunnel,
# jax.block_until_ready can return while the dispatched work is still
# executing remotely (measured: 41 ms "at block" vs +1355 ms until the
# value actually materialized — a 30x fantasy if the clock stops at the
# block). Every warmup and every timed region here therefore ends with a
# VALUE FETCH (float(value) / np.asarray), which cannot complete before
# the computation chain that produces it. The fetch adds one ~10-50 ms
# RPC to the timed window — amortized over >=25 chained calls, and in
# the conservative direction.

DIM_IN, HID, OUT = 280, 500, 100
B_SAME = 64
B_DIFF = 64
T = 96  # ~1s word tokens at 100 fps


# ---------------------------------------------------------------------------
# MFU (round-5): every metric line also reports model-FLOPs utilisation —
# analytic FLOPs of the work the metric's executable performs, divided by
# measured (fetch-terminated) wall time and the chip's peak. Conventions
# (see BASELINE.md "MFU decomposition" for the roofline split):
# - FLOPs count the MATMUL terms (towers fwd/bwd, cosine matrices) plus the
#   O(T^2) DTW DP; elementwise/optimizer work is excluded, so the reported
#   MFU is slightly CONSERVATIVE.
# - the denominator is the chip's dense bf16 MXU peak (its headline
#   number). The towers run f32-precision matmuls (XLA issues them as
#   multi-pass bf16 on TPU), so speed-of-light for this step is ~1/3 of
#   that peak — also noted in BASELINE.md.
# - unknown chips (this tunnel's 'axon' plug reports a generic kind) fall
#   back to ABNET3_PEAK_TFLOPS or the v5e figure, and the line says which.

_CHIP_PEAKS_TFLOPS = {
    # dense bf16 peak per chip, from published TPU specs
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0, "TPU v5e": 197.0,
    "TPU v5": 459.0, "TPU v5p": 459.0,
    "TPU v6 lite": 918.0, "TPU v6e": 918.0,
}


def _chip_peak_flops():
    """(peak_flops_per_sec, source_str). Detection order: exact
    device_kind match, ABNET3_PEAK_TFLOPS override, v5e assumption."""
    import os

    import jax
    kind = jax.devices()[0].device_kind
    for name, tf in _CHIP_PEAKS_TFLOPS.items():
        if kind.lower().startswith(name.lower()):
            return tf * 1e12, kind
    env = os.environ.get("ABNET3_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12, f"{kind} (ABNET3_PEAK_TFLOPS={env})"
    return 197.0e12, f"{kind} (unrecognized; assuming v5e 197 TF bf16)"


_TOWER_MATMUL_PARAMS = DIM_IN * HID + HID * HID + HID * OUT  # 440k


def train_step_flops() -> float:
    """Analytic FLOPs of ONE optimizer step of the matrix-loss train
    recipe (what bench_ours/bench_trainer_loop execute per chained
    sub-step):

    - towers: every frame of every token embeds once (matrix mode);
      fwd = 2 * params_matmul per frame, bwd = 2x fwd -> 6 * P * F
      with F = (B_SAME + B_DIFF) * 2 * T padded frames;
    - DTW alignment (same pairs): input-space cosine matrix
      2 * T^2 * DIM_IN (fwd only — alignment is stop-grad) + ~20 T^2
      VPU ops for the fused fwd+reverse path-mask DP;
    - matrix loss (same pairs): embedding cosine matrix 2 * T^2 * OUT
      fwd + two matmuls in its cotangent -> 6 * T^2 * OUT
      (diff pairs reduce to diagonal cosines — negligible)."""
    frames = (B_SAME + B_DIFF) * 2 * T
    towers = 6.0 * _TOWER_MATMUL_PARAMS * frames
    align = B_SAME * (2.0 * T * T * DIM_IN + 20.0 * T * T)
    mloss = B_SAME * 6.0 * T * T * OUT
    return towers + align + mloss


def embed_chunk_flops(chunk: int) -> float:
    """Analytic FLOPs of one forward-only embed chunk (int8 encode's
    elementwise work excluded — conservative)."""
    return 2.0 * _TOWER_MATMUL_PARAMS * chunk


def _make_batch(seed=0):
    rng = np.random.RandomState(seed)
    f1s = np.asarray(rng.randn(B_SAME, T, DIM_IN), np.float32)
    f2s = np.asarray(rng.randn(B_SAME, T, DIM_IN), np.float32)
    n1s = rng.randint(T // 2, T + 1, B_SAME).astype(np.int32)
    n2s = rng.randint(T // 2, T + 1, B_SAME).astype(np.int32)
    f1d = np.asarray(rng.randn(B_DIFF, T, DIM_IN), np.float32)
    f2d = np.asarray(rng.randn(B_DIFF, T, DIM_IN), np.float32)
    n1d = rng.randint(T // 2, T + 1, B_DIFF).astype(np.int32)
    n2d = rng.randint(T // 2, T + 1, B_DIFF).astype(np.int32)
    return f1s, f2s, n1s, n2s, f1d, f2d, n1d, n2d


def _frames_in_batch(batch):
    """Aligned frame pairs produced by one batch (DTW path lengths depend
    on data; count same-pair paths via the host oracle + diff truncation)."""
    from abnet3_tpu.utils import get_dtw_alignment
    f1s, f2s, n1s, n2s, _, _, n1d, n2d = batch
    total = 0
    for b in range(B_SAME):
        p1, _ = get_dtw_alignment(f1s[b, :n1s[b]], f2s[b, :n2s[b]])
        total += len(p1)
    total += int(np.minimum(n1d, n2d).sum())
    return total


def bench_trainer_loop(shared, n_calls=20):
    """Trainer-loop throughput: the same chained step as bench_ours but
    with the HOST side of the production loop inside the timing — fresh
    id-batch assembly (numpy permutation + stacking, what SplitBankBatch
    does per epoch) and the per-dispatch h2d of the id arrays. This is
    what TrainerSiamese actually sustains per dispatch, minus file IO.

    ``shared`` reuses bench_ours's compiled step + bank + init state
    AND its steps_per_call (the executable's K is baked in at trace
    time): re-tracing an identical ~100-300 s remote-compile executable
    would only measure the compile service twice."""
    import jax
    import optax

    step, K, bank, net, params, state = shared
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(0)
    rng_ids = np.random.RandomState(11)
    ws = np.ones((K, B_SAME), np.float32)
    wd = np.ones((K, B_DIFF), np.float32)

    group_ids = [np.asarray(bank.ids(
        [(g, b) for b in range(B_SAME if g < 2 else B_DIFF)]))
        for g in range(4)]

    def fresh_args():
        # ONE permutation shared by both sides of a pair type: the
        # timed step must align the same (f1s[b], f2s[b]) pairs the
        # frame-pairs/s numerator was counted on (independent perms
        # mispaired the tokens the metric never processes)
        def pair(ga, gb):
            perms = [rng_ids.permutation(len(group_ids[ga]))
                     for _ in range(K)]
            return (np.stack([group_ids[ga][p] for p in perms]),
                    np.stack([group_ids[gb][p] for p in perms]))
        s1, s2 = pair(0, 1)
        d1, d2 = pair(2, 3)
        return (s1, s2, ws, d1, d2, wd)

    for i in range(max(30 // K, 4)):
        params, state, opt_state, value = step(
            params, state, opt_state, rng, *fresh_args())
    float(value)  # fetch: block_until_ready can return early (header)
    t0 = time.perf_counter()
    for i in range(n_calls):
        params, state, opt_state, value = step(
            params, state, opt_state, rng, *fresh_args())
    v = float(value)  # fetch INSIDE the timed region (header)
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    return n_calls * K / dt


def bench_ours(batch, n_calls=25, steps_per_call=8):
    """The TPU-native training recipe exactly as TrainerSiamese runs it:
    the token corpus is uploaded to HBM once (TokenBank); each dispatch
    streams only int32 token ids for steps_per_call batches and lax.scans
    that many optimizer steps in one XLA computation, amortizing the
    per-dispatch latency. Alignment runs matrix-mode (the default): the
    fused fwd+reverse Pallas kernel emits the DTW path MASK, each frame
    embeds once, and the loss reduces the mask-weighted embedding cosine
    matrix — no backtrace walk, no frame gathers (parallel/mesh.py
    use_matrix_loss)."""
    import jax
    import jax.numpy as jnp
    import optax
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.ops.bank import TokenBank
    from abnet3_tpu.parallel import make_mesh, make_split_pair_train_step

    f1s, f2s, n1s, n2s, f1d, f2d, n1d, n2d = batch
    # bank holds the same tokens the baseline consumes
    token_feats = {}
    for g, (f, n) in enumerate(((f1s, n1s), (f2s, n2s), (f1d, n1d),
                                (f2d, n2d))):
        for b in range(f.shape[0]):
            token_feats[(g, b)] = f[b, :n[b]]
    bank = TokenBank(token_feats)
    K = steps_per_call
    # a rotation of DISTINCT id batches (different permutations per epoch,
    # staged to HBM up front like SplitBankBatch does) so successive
    # dispatches never replay the same executable+inputs and the epoch's
    # batch variety is included in the measurement
    n_variants = 4
    rng_ids = np.random.RandomState(7)
    variants = []
    one = (lambda n: np.ones((K, n) if K > 1 else (n,), np.float32))
    ws = jax.device_put(one(B_SAME))
    wd = jax.device_put(one(B_DIFF))
    for _ in range(n_variants):
        ids = []
        # one permutation per pair TYPE so (f1s[b], f2s[b]) stay the
        # matched pairs the frame count was measured on (see fresh_args)
        for ga, gb, nb in ((0, 1, B_SAME), (2, 3, B_DIFF)):
            perm = rng_ids.permutation(nb)
            for g in (ga, gb):
                flat = bank.ids([(g, b) for b in perm])
                ids.append(jax.device_put(
                    np.tile(flat, (K, 1)) if K > 1 else flat))
        variants.append((ids[0], ids[1], ws, ids[2], ids[3], wd))

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    net = SiameseNetwork(input_dim=DIM_IN, num_hidden_layers=2,
                         hidden_dim=HID, output_dim=OUT, p_dropout=0.0,
                         activation_layer="sigmoid")
    params, state = net.init_params(jax.random.PRNGKey(0))
    loss = coscos2()
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step, _ = make_split_pair_train_step(net, loss, optimizer, bank, mesh,
                                         steps_per_call=K)
    rng = jax.random.PRNGKey(0)

    # warmup: compile + the tunnel's slow first post-compile steps. The
    # fetch (not block_until_ready — see header) guarantees warmup has
    # actually finished executing before the clock starts.
    for i in range(max(30 // K, 4)):
        params, state, opt_state, value = step(
            params, state, opt_state, rng, *variants[i % n_variants])
    float(value)
    t0 = time.perf_counter()
    for i in range(n_calls):
        params, state, opt_state, value = step(
            params, state, opt_state, rng, *variants[i % n_variants])
    v = float(value)  # fetch INSIDE the timed region (header)
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    # the trained tower rides into the embed benchmarks (exports measure
    # the TRAINED output distribution) and the compiled step + its K +
    # bank into bench_trainer_loop — no executable compiles twice
    return n_calls * K / dt, (step, K, bank, net, params, state)


EMBED_CHUNK = 4096
EMBED_CHUNKS = 48  # ~200k frames


_CHUNK_FN_CACHE = {}


def _smooth_chunk_fn():
    """Jitted k -> (EMBED_CHUNK, DIM_IN) temporally-smooth corpus chunk:
    coarse Gaussian knots linearly interpolated x8 (~12.5 Hz modulation
    at 100 fps — the smoothness scale of real stacked-fbank speech
    features; random per chunk, so the tunnel replay cache never hits).
    Memoized: the round-5 median-of-3 export sampling calls
    bench_embed_ours repeatedly, and a fresh jit per call would pay the
    remote compile service each time."""
    import jax
    import jax.numpy as jnp

    fn = _CHUNK_FN_CACHE.get("smooth")
    if fn is not None:
        return fn

    @jax.jit
    def chunk(k):
        key = jax.random.fold_in(jax.random.PRNGKey(1), k)
        coarse = jax.random.normal(key, (EMBED_CHUNK // 8 + 1, DIM_IN),
                                   jnp.float32)
        t = jnp.arange(EMBED_CHUNK) / 8.0
        i0 = jnp.floor(t).astype(jnp.int32)
        frac = (t - i0)[:, None]
        return coarse[i0] * (1.0 - frac) + coarse[i0 + 1] * frac

    _CHUNK_FN_CACHE["smooth"] = chunk
    return chunk


def bench_embed_ours(corpus="realistic", params=None, state=None, net=None,
                     n_warm=8, forward=None):
    """North-star metric #1: embedded frames/sec/chip.

    The production embed recipe (embedder.py _embed_corpus): one jitted
    forward per fixed-size chunk, asynchronously dispatched with
    overlapped device->host copies, int8 transfer codec
    (embedder.encode_transfer — 1 B/value on the wire, files store
    float32; host-side dequantization is inside the timing). The corpus
    lives device-resident (generated in HBM — export throughput, not the
    dev tunnel's h2d rate, is what production hosts see); every chunk is
    distinct data so the tunnel's replay cache cannot skew the timing.

    corpus='realistic': temporally-smooth speech-like input through the
    trained tower — what a real export ships (the headline case).
    corpus='random': i.i.d. Gaussian input — incompressible-wire worst
    case, reported separately and honestly (the dev tunnel compresses
    transfers, so wire entropy sets the d2h ceiling here)."""
    import jax
    import jax.numpy as jnp
    from abnet3_tpu.embedder import decode_transfer, encode_transfer
    from abnet3_tpu.models import SiameseNetwork

    if net is None:
        net = SiameseNetwork(input_dim=DIM_IN, num_hidden_layers=2,
                             hidden_dim=HID, output_dim=OUT, p_dropout=0.0,
                             activation_layer="sigmoid")
        params, state = net.init_params(jax.random.PRNGKey(0))
    if state is None:
        state = {}

    if corpus == "realistic":
        chunk_fn = _smooth_chunk_fn()
    else:
        chunk_fn = _CHUNK_FN_CACHE.get("random")
        if chunk_fn is None:
            @jax.jit
            def chunk_fn(k):
                return jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(1), k),
                    (EMBED_CHUNK, DIM_IN), jnp.float32)
            _CHUNK_FN_CACHE["random"] = chunk_fn

    chunks = [chunk_fn(k) for k in range(EMBED_CHUNKS)]
    for c in chunks:  # scalar fetches: force the corpus materialized
        float(c[0, 0])  # before timing (block_until_ready lies — header)

    if forward is None:
        # callers benchmarking both corpus cases pass one shared jitted
        # forward so the identical executable compiles once
        @jax.jit
        def forward(params, x):
            out, _ = net.forward_once(params, state, x, train=False)
            return encode_transfer(out, "int8")

    def run(n):
        window, pending, out = 16, [], []
        for k in range(n):
            head = forward(params, chunks[k % EMBED_CHUNKS])
            for leaf in head:
                try:
                    leaf.copy_to_host_async()
                except AttributeError:
                    pass
            pending.append(head)
            if len(pending) >= window:
                out.append(decode_transfer(pending.pop(0)))
        while pending:
            out.append(decode_transfer(pending.pop(0)))
        return out

    run(n_warm)  # compile + post-compile warmup
    t0 = time.perf_counter()
    out = run(EMBED_CHUNKS)
    dt = time.perf_counter() - t0
    assert len(out) == EMBED_CHUNKS and out[0].shape == (EMBED_CHUNK, OUT)
    assert out[0].dtype == np.float32
    return EMBED_CHUNKS * EMBED_CHUNK / dt


def bench_embed_torch(n_chunks=12):
    """Reference embed recipe on this host: chunked torch-CPU forward +
    numpy copy-out (reference embedder.py:85-96)."""
    import torch
    import torch.nn as nn

    layers = []
    dims = [DIM_IN, HID, HID, OUT]
    for i in range(3):
        layers += [nn.Linear(dims[i], dims[i + 1]), nn.Dropout(0.0),
                   nn.Sigmoid()]
    net = nn.Sequential(*layers).eval()
    rng = np.random.RandomState(0)
    feats = rng.randn(EMBED_CHUNK, DIM_IN).astype(np.float32)
    with torch.no_grad():
        net(torch.from_numpy(feats[:256]))  # warm
        t0 = time.perf_counter()
        for k in range(n_chunks):
            emb = net(torch.from_numpy(feats)).numpy()
        dt = time.perf_counter() - t0
    assert emb.shape == (EMBED_CHUNK, OUT)
    return n_chunks * EMBED_CHUNK / dt


def bench_torch_baseline(batch, n_steps=6):
    import torch
    import torch.nn as nn
    from abnet3_tpu.utils import cosine_distance, dtw_numpy_fast

    layers = []
    dims = [DIM_IN, HID, HID, OUT]
    for i in range(3):
        layers += [nn.Linear(dims[i], dims[i + 1]), nn.Dropout(0.0),
                   nn.Sigmoid()]
    net = nn.Sequential(*layers).train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    cos = nn.CosineSimilarity(dim=1, eps=1e-6)

    f1s, f2s, n1s, n2s, f1d, f2d, n1d, n2d = batch
    t0 = time.perf_counter()
    for _ in range(n_steps):
        X1, X2, Y = [], [], []
        # host batch construction (reference dataloader.py:166-255)
        for b in range(B_SAME):
            a = f1s[b, :n1s[b]]
            c = f2s[b, :n2s[b]]
            dist = cosine_distance(a, c)
            _, p1, p2 = dtw_numpy_fast(dist)
            X1.append(a[p1])
            X2.append(c[p2])
            Y.append(np.ones(len(p1), np.float32))
        for b in range(B_DIFF):
            n = min(n1d[b], n2d[b])
            X1.append(f1d[b, :n])
            X2.append(f2d[b, :n])
            Y.append(-np.ones(n, np.float32))
        X1 = torch.from_numpy(np.vstack(X1))
        X2 = torch.from_numpy(np.vstack(X2))
        Y = torch.from_numpy(np.concatenate(Y))
        # siamese fwd/bwd + update (reference trainer.py:226-242)
        e1, e2 = net(X1), net(X2)
        c = cos(e1, e2)
        vals = torch.where(Y > 0, (1 - c) / 2, c ** 2)
        loss = vals.mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return n_steps / dt


def _median_of(fn, n=3):
    """Median-of-n for the torch-CPU baseline denominators: a single
    timing inherits host-load noise and swung the vs_baseline ratios
    ~2x run-to-run (round-3 review weak #6); the median of three
    independent runs pins the scorecard's denominator."""
    vals = sorted(fn() for _ in range(n))
    return vals[n // 2]


def main():
    batch = _make_batch()
    frames = _frames_in_batch(batch)
    ours_sps, shared = bench_ours(batch)
    _, _, _, enet, eparams, estate = shared
    base_sps = _median_of(lambda: bench_torch_baseline(batch))
    peak, chip = _chip_peak_flops()
    step_fl = train_step_flops()
    frame_fl = embed_chunk_flops(1)
    print(json.dumps({
        "metric": ("siamese train throughput/chip: DTW-aligned frame pairs "
                   "through a full train step (align+fwd+bwd+update)"),
        "value": round(ours_sps * frames, 1),
        "unit": "frame-pairs/s",
        "vs_baseline": round(ours_sps / base_sps, 2),
        "mfu": round(ours_sps * step_fl / peak, 5),
        "chip": chip,
    }), flush=True)
    # metric 1's trained tower feeds both export cases: exports ship the
    # TRAINED output distribution, not init noise; one shared forward
    # executable serves both corpus cases
    import jax
    from abnet3_tpu.embedder import encode_transfer

    @jax.jit
    def embed_forward(p, x):
        out, _ = enet.forward_once(p, estate, x, train=False)
        return encode_transfer(out, "int8")

    # The export metrics ride the tunnel's d2h, whose bandwidth swings
    # 12-45 MB/s over MINUTES (round-5: the same code measured 153k in
    # one window and 340k a few minutes later in one bench run). Each
    # export case is therefore the MEDIAN of 3 samples SPREAD across
    # the run (back-to-back samples would share one window); the timed
    # region per sample is seconds, so the spread costs little.
    embed_samples = [bench_embed_ours("realistic", eparams, estate,
                                      enet, forward=embed_forward)]
    embed_base = _median_of(bench_embed_torch)
    worst_samples = [bench_embed_ours("random", eparams, estate, enet,
                                      forward=embed_forward, n_warm=0)]
    loop_sps = bench_trainer_loop(shared)
    embed_samples.append(bench_embed_ours("realistic", eparams, estate,
                                          enet, forward=embed_forward,
                                          n_warm=0))
    worst_samples.append(bench_embed_ours("random", eparams, estate,
                                          enet, forward=embed_forward,
                                          n_warm=0))
    base_sps2 = _median_of(lambda: bench_torch_baseline(batch), n=1)
    del base_sps2  # spacer workload between the d2h samples
    embed_samples.append(bench_embed_ours("realistic", eparams, estate,
                                          enet, forward=embed_forward,
                                          n_warm=0))
    worst_samples.append(bench_embed_ours("random", eparams, estate,
                                          enet, forward=embed_forward,
                                          n_warm=0))
    embed_fps = sorted(embed_samples)[1]
    worst_fps = sorted(worst_samples)[1]
    print(json.dumps({
        "metric": ("embedding-export throughput/chip: trained-tower "
                   "embeddings of a speech-like (temporally smooth) "
                   "corpus through the jitted pipelined embedder, int8 "
                   "transfer codec incl. d2h copy-out + host dequant "
                   "(files store float32)"),
        "value": round(embed_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(embed_fps / embed_base, 2),
        "mfu": round(embed_fps * frame_fl / peak, 6),
        "samples": [round(v, 1) for v in embed_samples],
    }), flush=True)
    print(json.dumps({
        "metric": ("trainer-loop throughput/chip: as metric 1 plus the "
                   "host side of every dispatch (fresh id-batch assembly "
                   "+ id h2d), i.e. what TrainerSiamese sustains"),
        "value": round(loop_sps * frames, 1),
        "unit": "frame-pairs/s",
        "vs_baseline": round(loop_sps / base_sps, 2),
        "mfu": round(loop_sps * step_fl / peak, 5),
    }), flush=True)
    print(json.dumps({
        "metric": ("embedding-export worst case: same path on an "
                   "incompressible i.i.d.-Gaussian corpus — wire entropy "
                   "bounds the dev tunnel's ~10-40 MB/s d2h; production "
                   "PCIe hosts track the forward-only rate instead "
                   "(BASELINE.md)"),
        "value": round(worst_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(worst_fps / embed_base, 2),
        "mfu": round(worst_fps * frame_fl / peak, 6),
        "samples": [round(v, 1) for v in worst_samples],
    }), flush=True)


if __name__ == "__main__":
    main()
