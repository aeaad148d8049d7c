"""Device meshes and sharded training.

The reference is single-device: its only notion of placement is
``.cuda()`` pushes per batch (reference trainer.py:218-221) and a global
``torch.cuda.set_device`` (reference gridsearch.py:322-323). Here scaling is
expressed the TPU way: a ``jax.sharding.Mesh`` over the chips, NamedSharding
annotations on batches (data-parallel axis) and parameters (optional
tensor-parallel axis over hidden units), and one jitted **fused train step**
— on-device DTW alignment + frame gather + both siamese towers + loss +
backward + optimizer update — compiled once over the whole mesh; XLA/GSPMD
inserts the gradient all-reduces over ICI.

Axes:
- ``data``: batch of token pairs (pure DP; gradients psum'd by GSPMD)
- ``model``: hidden dimension of the MLP towers (TP; free with GSPMD —
  useful when hidden_dim is large or many chips share one batch)

Pipeline/sequence/expert parallelism do not apply to this model family
(frame-independent MLP towers, no layer pipeline, no experts); the
sequence-length-scaling analogue here is the batched wavefront DTW itself
(see SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import os
import threading

from abnet3_tpu.ops.dtw import (align_diff_batch, dtw_align_from_dist,
                                dtw_path_from_dist, gather_aligned,
                                pairwise_angular_distance)

_INIT_LOCK = threading.Lock()

__all__ = ["make_mesh", "param_shardings", "shard_array",
           "make_fused_train_step", "make_frame_train_step",
           "make_pair_train_step", "make_split_pair_train_step",
           "make_sampled_train_step", "make_sampled_eval_step",
           "use_matrix_loss"]


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), \
        f"need {n_data * n_model} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n_data * n_model]).reshape(
        (n_data, n_model))
    return Mesh(dev_array, ("data", "model"))


def shard_array(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel layout for MLP tower params: every hidden-layer
    weight matrix splits its output dim over 'model'; biases follow.
    With a trivial 'model' axis this degrades to full replication."""
    def spec_for(path, leaf):
        if leaf.ndim == 2:
            return P(None, "model")
        if leaf.ndim == 1:
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)),
        params)


def mirror_shardings(tree, mesh: Mesh, like=None):
    """Steady-state layout for optimizer / batch-norm state trees:
    leaves shaped like a param matrix or bias follow the params' TP rule
    (optimizer moments stay co-located with the params they update — no
    per-step resharding); anything else (step counts, linesearch
    scalars, stacked LBFGS history) replicates.

    ``like`` (normally the param tree) supplies the shape inventory:
    only leaves whose full shape matches some param leaf's shape take
    the TP rule. Without it a bare divisibility heuristic applies,
    which can misfile non-param-shaped leaves — e.g. an optax LBFGS
    history-weight vector of length m with m % n_model == 0 would get
    P('model') and be resharded every step."""
    n_model = mesh.shape["model"]
    shapes = None
    if like is not None:
        shapes = {tuple(getattr(l, "shape", ()))
                  for l in jax.tree_util.tree_leaves(like)}

    def spec(leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        if shapes is not None and shape not in shapes:
            return P()
        if len(shape) == 2 and shape[-1] % n_model == 0:
            return P(None, "model")
        if len(shape) == 1 and shape[0] and shape[0] % n_model == 0:
            return P("model")
        return P()

    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, spec(leaf)), tree)


def _steady_place(cache, mesh, params, state, opt_state=None):
    """device_put the training-state trees onto their steady shardings
    (shardings cached across calls; the puts are no-ops once placed).

    Without this every step executable compiles TWICE: the first
    dispatch sees freshly-initialised UNCOMMITTED trees, while every
    later dispatch sees the previous step's outputs, committed to the
    mesh by out_shardings — jax keys its jit cache on the argument's
    committed mesh axes ('explain_cache_misses' shows the key differing
    only in ``f32[...]({Auto: ('data','model')})`` vs ``f32[...]({})``),
    and through the remote compile service each extra compile costs
    50-140 s. Placing the trees up front gives both cases one key, and
    lets a prewarm call warm the SAME executable the loop then uses.

    Factory caches are shared between a factory's train/eval closures
    and touched concurrently by the trainer's prewarm threads, so the
    lazy init is double-checked under a lock (a half-initialised cache
    — 'p_shard' present, 's_shard' not yet — would KeyError in the
    sibling thread and silently skip that prewarm)."""
    if "p_shard" not in cache or "s_shard" not in cache:
        with _INIT_LOCK:
            if "p_shard" not in cache:
                cache["p_shard"] = param_shardings(params, mesh)
            if "s_shard" not in cache:
                cache["s_shard"] = mirror_shardings(state, mesh,
                                                    like=params)
    out = (jax.device_put(params, cache["p_shard"]),
           jax.device_put(state, cache["s_shard"]))
    if opt_state is None:
        return out
    if "o_shard" not in cache:
        with _INIT_LOCK:
            if "o_shard" not in cache:
                cache["o_shard"] = mirror_shardings(opt_state, mesh,
                                                    like=params)
    return out + (jax.device_put(opt_state, cache["o_shard"]),)


def _placed_consts(cache, mesh, consts):
    """Replicated placement of a factory's device-resident corpus state
    (BankViews, frame tables), once per factory cache (the device_put is
    a no-op afterwards). Passing these through the jit boundary as
    ARGUMENTS instead of closures keeps the corpus out of the lowered
    HLO — a closed-over device array becomes an HLO literal, so the
    compiled executable (and every remote-compile request body) would
    carry the whole corpus: measured 106 s vs 0.5 s compile+run for one
    gather over a 50 MB table through this environment's compile
    service, and HTTP 413 outright above a few hundred MB (see
    ops.bank.BankView)."""
    if "consts" not in cache:
        with _INIT_LOCK:
            if "consts" not in cache:
                rep = NamedSharding(mesh, P())
                cache["consts"] = jax.device_put(
                    consts, jax.tree_util.tree_map(lambda _: rep, consts))
    return cache["consts"]


def _cached_jit(cache, key, make):
    """Create-once jit wrapper under the init lock: two prewarm threads
    racing past ``key not in cache`` would otherwise each build a
    jax.jit instance, one overwriting the other — and the loser's
    compile (the whole point of prewarming) is thrown away, so the
    first real dispatch recompiles."""
    if key not in cache:
        with _INIT_LOCK:
            if key not in cache:
                cache[key] = make()
    return cache[key]


def opt_update(optimizer, grads, opt_state, params, value, value_fn):
    """optimizer.update with the closure extra-args every step factory
    provides: optax's LBFGS zoom linesearch consumes
    (value, grad, value_fn) — the torch closure-mode contract of the
    reference's LBFGS (reference trainer.py:68-87) — while every other
    optax transform is a GradientTransformationExtraArgs that ignores
    them (and XLA dead-code-eliminates the unused value_fn closure)."""
    return optimizer.update(grads, opt_state, params, value=value,
                            grad=grads, value_fn=value_fn)


def use_matrix_loss(loss, extra_labels: bool = False,
                    override: Optional[bool] = None) -> bool:
    """Whether a step factory should take the matrix-loss path.

    Matrix mode is the TPU-first alignment contract: the DTW path never
    materializes as per-step frame indices. Instead the fused Pallas
    forward+reverse kernel emits the alignment mask A (B, T1, T2), every
    frame is embedded exactly ONCE (the gather path embeds each frame
    once per path visit — ~1.5x the tower FLOPs at T=96), and the loss
    is an A-weighted reduction of the embedding cosine matrix computed
    on the MXU. Identical loss values and batch-norm statistics to the
    gather path (visit counts become BN weights); with dropout the
    regularization moves from per-visit masks to per-frame masks (same
    expectation, tested equivalent at p_dropout=0).

    Requires a loss with a per-cell decomposition (``supports_cells``:
    coscos2/cosmargin via the cosine matrix, KLLoss via two
    entropy-minus-matmul matrices) — for multitask (extra_labels), a
    weighted_loss_multi whose BOTH sub-losses have one (the per-head
    cell matrices then reduce under the same alignment mask).
    ``override`` (factory arg) wins, then ABNET3_MATRIX_LOSS=0/1, then
    auto (on whenever supported).
    """
    if override is not None:
        return bool(override)
    flag = os.environ.get("ABNET3_MATRIX_LOSS", "").lower()
    if flag in ("0", "false", "no", "off"):
        return False
    if flag in ("1", "true", "yes", "on"):
        # force on: an unsupported loss then fails loudly in
        # pair_cells/from_cells instead of silently taking gather
        return True
    if extra_labels:
        return getattr(loss, "supports_multi_cells", False)
    return getattr(loss, "supports_cells", False)


def _chain_steps(one_step, eval_step, mesh: Mesh, n_batch_args: int,
                 K: int, fill_for, consts=()):
    """Shared scaffolding of the bank/frame step factories: K-chained
    dispatch (lax.scan over stacked batches), data-axis padding, and the
    lazily-jitted (train, eval) pair.

    one_step(consts, params, state, opt_state, rng, args) -> (params,
    state, opt_state, value); eval_step(consts, params, state, *args) ->
    value; fill_for(i) -> pad constant for batch arg i (ids 0, labels
    1.0, weights 0.0). With K > 1 every batch array carries a leading K
    axis; the eval twin scans K losses and returns the (K,) values.

    ``consts`` is the factory's device-resident corpus state (BankViews,
    frame tables): it crosses the jit boundary as an ARGUMENT, not a
    closure — a closed-over device array lowers into the HLO as a
    literal, so the compiled executable (and, through a remote compile
    service, every compile request body) would carry the whole corpus
    (HTTP 413 at large N; see ops.bank.BankView). It is device_put once
    onto the replicated mesh sharding and reused every dispatch.

    With K > 1 the train step also accepts ``valid=<(K,) float mask>``
    (default all-ones): steps with valid[k] == 0 run but their
    params/state/opt-state updates are discarded and their loss is
    excluded from the returned mean. Partial buffers at pass end pad to
    K with repeated batches + a zero mask and reuse the SAME executable
    — a K=1 flush variant would cost a fresh remote compile (~30-100 s
    through the tunnel's compile service) to process a handful of
    leftover batches."""
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    assert K >= 1, "steps_per_call must be >= 1"

    if K == 1:
        def step(consts, params, state, opt_state, rng, *args):
            return one_step(consts, params, state, opt_state, rng, args)

        def eval_fn(consts, params, state, *args):
            return eval_step(consts, params, state, *args)
        dp_step = dp
    else:
        def step(consts, params, state, opt_state, rng, valid, *stacked):
            def body(carry, inp):
                p, s, o = carry
                k, v, args = inp[0], inp[1], inp[2:]
                p2, s2, o2, val = one_step(consts, p, s, o,
                                           jax.random.fold_in(rng, k),
                                           args)
                keep = v > 0

                def sel(a, b):
                    return jnp.where(keep, a, b)
                p = jax.tree_util.tree_map(sel, p2, p)
                s = jax.tree_util.tree_map(sel, s2, s)
                o = jax.tree_util.tree_map(sel, o2, o)
                return (p, s, o), jnp.where(keep, val, 0.0)
            (params, state, opt_state), values = jax.lax.scan(
                body, (params, state, opt_state),
                (jnp.arange(K), valid) + stacked)
            return params, state, opt_state, (
                jnp.sum(values) / jnp.maximum(jnp.sum(valid), 1.0))

        def eval_fn(consts, params, state, *stacked):
            def body(_, args):
                return None, eval_step(consts, params, state, *args)
            _, values = jax.lax.scan(body, None, stacked)
            return values
        dp_step = NamedSharding(mesh, P(None, "data"))

    cache = {}
    n_data = mesh.shape["data"]
    group_axis = 0 if K == 1 else 1

    def _consts():
        return _placed_consts(cache, mesh, consts)

    def _pad(args):
        """Batch rows must divide the data axis; padded entries carry
        zero weight by construction of fill_for."""
        if n_data == 1:
            return args
        out = []
        for i, a in enumerate(args):
            pad = (-a.shape[group_axis]) % n_data
            if pad:
                widths = [(0, 0)] * a.ndim
                widths[group_axis] = (0, pad)
                a = jnp.pad(a, widths, constant_values=fill_for(i))
            out.append(a)
        return tuple(out)

    def compiled(params, state, opt_state, rng, *batch, valid=None):
        params, state, opt_state = _steady_place(cache, mesh, params,
                                                 state, opt_state)
        extra = () if K == 1 else (rep,)
        fn = _cached_jit(cache, "jit", lambda: jax.jit(
            step,
            in_shardings=(rep, cache["p_shard"], cache["s_shard"],
                          cache["o_shard"], rep) + extra
            + (dp_step,) * n_batch_args,
            out_shardings=(cache["p_shard"], cache["s_shard"],
                           cache["o_shard"], None)))
        if K == 1:
            assert valid is None, "valid masks need steps_per_call > 1"
            return fn(_consts(), params, state, opt_state, rng,
                      *_pad(batch))
        if valid is None:
            valid = jnp.ones(K, jnp.float32)
        return fn(_consts(), params, state, opt_state, rng,
                  jnp.asarray(valid, jnp.float32), *_pad(batch))

    def compiled_eval(params, state, *batch):
        params, state = _steady_place(cache, mesh, params, state)
        fn = _cached_jit(cache, "ejit", lambda: jax.jit(
            eval_fn,
            in_shardings=(rep, cache["p_shard"], cache["s_shard"])
            + (dp_step,) * n_batch_args))
        return fn(_consts(), params, state, *_pad(batch))

    return compiled, compiled_eval


def _diff_path_mask(p1d, p2d, plen_d, wd, T1: int, T2: int) -> jnp.ndarray:
    """Scatter a diff-pair alignment path (diagonal-stretch mode,
    ops.dtw.align_diff_batch) into a (B, T1, T2) mask weighted by the
    per-pair weight — the diff-pair twin of the DTW path mask."""
    B, L = p1d.shape
    dmask = ((jnp.arange(L)[None, :] < plen_d[:, None])
             .astype(jnp.float32) * wd[:, None])
    A = jnp.zeros((B, T1, T2), jnp.float32)
    return A.at[jnp.arange(B)[:, None], p1d, p2d].add(dmask)


def _diff_mask(n1, n2, wd, T1: int, T2: int,
               align_different_words: bool) -> jnp.ndarray:
    """(B, T1, T2) alignment mask for different-word pairs.

    Truncate mode (the default) is a pure iota comparison — the diagonal
    prefix up to min(n1, n2) — with no scatter (XLA scatters cost ~0.1ms
    at these shapes on TPU); diagonal-stretch mode scatters the rounded
    linspace path."""
    if not align_different_words:
        ii = jnp.arange(T1)[None, :, None]
        jj = jnp.arange(T2)[None, None, :]
        minlen = jnp.minimum(n1, n2)[:, None, None]
        return ((ii == jj) & (ii < minlen)).astype(jnp.float32) \
            * wd[:, None, None]
    p1d, p2d, plen_d = align_diff_batch(
        n1, n2, T1, T2, align_different_words=True)
    return _diff_path_mask(p1d, p2d, plen_d, wd, T1, T2)


def _align_and_flatten(network, loss, f1s, f2s, n1s, n2s,
                       f1d, f2d, n1d, n2d, mesh=None):
    """Shared fused-step body: on-device alignment + flattened frame
    batch with padding weights.

    mesh: >1-device meshes run the fused Pallas move kernel through
    shard_map over 'data' (GSPMD cannot auto-partition a pallas_call);
    the same-pair batch must divide the 'data' axis."""
    dist = pairwise_angular_distance(f1s, f2s)
    p1s, p2s, plens = dtw_align_from_dist(dist, n1s, n2s, mesh=mesh)
    x1s = gather_aligned(f1s, p1s)
    x2s = gather_aligned(f2s, p2s)
    Ls = x1s.shape[1]
    ws = (jnp.arange(Ls)[None, :] < plens[:, None]).astype(jnp.float32)

    Td1, Td2 = f1d.shape[1], f2d.shape[1]
    p1d, p2d, plend = align_diff_batch(n1d, n2d, Td1, Td2)
    x1d = gather_aligned(f1d, p1d)
    x2d = gather_aligned(f2d, p2d)
    Ld = x1d.shape[1]
    wd = (jnp.arange(Ld)[None, :] < plend[:, None]).astype(jnp.float32)

    d = x1s.shape[-1]
    x1 = jnp.concatenate([x1s.reshape(-1, d), x1d.reshape(-1, d)])
    x2 = jnp.concatenate([x2s.reshape(-1, d), x2d.reshape(-1, d)])
    y = jnp.concatenate([jnp.ones(x1s.shape[0] * Ls),
                         -jnp.ones(x1d.shape[0] * Ld)])
    w = jnp.concatenate([ws.reshape(-1), wd.reshape(-1)])
    return x1, x2, y, w


def _matrix_same_diff_parts(f1s, f2s, n1s, n2s, ws,
                            f1d, f2d, n1d, n2d, wd,
                            align_different_words: bool, mesh):
    """Matrix-mode twin of :func:`_align_and_flatten` /
    :func:`_split_bank_align`: returns the unique-frame batch (every frame
    exactly once), per-frame visit-count weights (exact BN-stat parity
    with the gather path, where a frame contributes once per path visit),
    and the same/diff alignment masks that weight the cosine matrices in
    the loss."""
    dist = pairwise_angular_distance(f1s, f2s)
    A_s = (dtw_path_from_dist(dist, n1s, n2s, mesh=mesh)
           * ws[:, None, None])
    T1d, T2d = f1d.shape[1], f2d.shape[1]
    d = f1s.shape[-1]
    if align_different_words:
        A_d = _diff_mask(n1d, n2d, wd, T1d, T2d, True)
        w1d, w2d = A_d.sum(2), A_d.sum(1)
    else:
        # truncate mode: the diff alignment is the diagonal prefix up to
        # min(n1, n2) — keep it as a (B, Tmin) weight row and compute
        # the diff cells ROW-WISE in _matrix_cell_terms instead of
        # paying a full (B, T, T) einsum for a diagonal
        Tm = min(T1d, T2d)
        minlen = jnp.minimum(n1d, n2d)
        A_d = ((jnp.arange(Tm)[None, :] < minlen[:, None])
               .astype(jnp.float32) * wd[:, None])
        w1d = jnp.pad(A_d, ((0, 0), (0, T1d - Tm)))
        w2d = jnp.pad(A_d, ((0, 0), (0, T2d - Tm)))
    frames = jnp.concatenate([f1s.reshape(-1, d), f2s.reshape(-1, d),
                              f1d.reshape(-1, d), f2d.reshape(-1, d)])
    w_frames = jnp.concatenate([
        A_s.sum(2).reshape(-1), A_s.sum(1).reshape(-1),
        w1d.reshape(-1), w2d.reshape(-1)])
    return frames, w_frames, A_s, (A_d, T1d, T2d)


def _split_group_rows(e, A_s, A_d_parts):
    """Split the unique-frame embedding rows [e1s; e2s; e1d; e2d; rest]
    back into per-group (B, T, E) tensors."""
    A_d, T1d, T2d = A_d_parts
    Bs, T1s, T2s = A_s.shape
    Bd = A_d.shape[0]
    i = 0
    e1s = e[i:i + Bs * T1s].reshape(Bs, T1s, -1); i += Bs * T1s
    e2s = e[i:i + Bs * T2s].reshape(Bs, T2s, -1); i += Bs * T2s
    e1d = e[i:i + Bd * T1d].reshape(Bd, T1d, -1); i += Bd * T1d
    e2d = e[i:i + Bd * T2d].reshape(Bd, T2d, -1); i += Bd * T2d
    return e1s, e2s, e1d, e2d, e[i:]


def _matrix_cell_terms(cell_loss, e, A_s, A_d_parts, y_s=None, y_d=None):
    """Flattened (cells, y, weights) loss terms from embeddings of the
    unique-frame batch laid out [f1s; f2s; f1d; f2d], using the loss's
    per-cell decomposition (loss.pair_cells/rowwise_cells: the cosine
    matrix for coscos2/cosmargin, the two KL matrices for KLLoss). The
    diff term is a full mask over (B, T, T) cells (stretch mode) or a
    diagonal weight row over row-wise cells (truncate mode).

    y_s / y_d: per-pair labels broadcast over each pair's cells (the
    multitask speaker stream); default +1 for same pairs, -1 for diff
    (the phoneme/monotask stream). Returns the terms plus any leftover
    rows (tcl frames appended by the caller)."""
    A_d, T1d, T2d = A_d_parts
    e1s, e2s, e1d, e2d, _ = _split_group_rows(e, A_s, A_d_parts)
    Bs, T1s, T2s = A_s.shape
    Bd = A_d.shape[0]
    c_s = cell_loss.pair_cells(e1s, e2s)        # (*stat, Bs, T1s, T2s)
    stat = c_s.shape[:-3]
    if A_d.ndim == 3:  # stretch mode: full mask
        c_d = cell_loss.pair_cells(e1d, e2d)
        c_d_flat = c_d.reshape(stat + (-1,))
    else:              # truncate mode: diagonal only
        Tm = A_d.shape[1]
        d = e1d.shape[-1]
        c_d = cell_loss.rowwise_cells(e1d[:, :Tm].reshape(-1, d),
                                      e2d[:, :Tm].reshape(-1, d))
        c_d_flat = c_d.reshape(stat + (-1,))
    n_s = Bs * T1s * T2s
    n_d = c_d_flat.shape[-1]
    if y_s is None:
        ys_cells = jnp.ones(n_s)
    else:
        ys_cells = jnp.broadcast_to(
            y_s[:, None, None], (Bs, T1s, T2s)).reshape(-1)
    if y_d is None:
        yd_cells = -jnp.ones(n_d)
    else:
        yd_cells = jnp.broadcast_to(
            y_d[:, None], (Bd, n_d // max(Bd, 1))).reshape(-1)
    c = jnp.concatenate([c_s.reshape(stat + (n_s,)), c_d_flat], axis=-1)
    y = jnp.concatenate([ys_cells, yd_cells])
    w = jnp.concatenate([A_s.reshape(-1), A_d.reshape(-1)])
    return c, y, w, _split_group_rows(e, A_s, A_d_parts)[-1]


def _bank_align(bank, ids1, ids2, y_pair, pair_w,
                align_different_words: bool, mesh=None,
                max_frames: int = None):
    """Gather pairs from the bank + per-pair alignment selected by label.

    Returns flattened (x1, x2, y, w) frame arrays with static shape
    (B * (2*T-1), ...). ``max_frames`` selects a length bucket (static
    time slice of the bank) so short pairs run small DTW shapes."""
    T = max_frames if max_frames is not None else bank.max_len
    L = 2 * T - 1
    f1, n1 = bank.take(ids1, T)
    f2, n2 = bank.take(ids2, T)
    dist = pairwise_angular_distance(f1, f2)
    p1s, p2s, plen_s = dtw_align_from_dist(dist, n1, n2, mesh=mesh)
    p1d, p2d, plen_d = align_diff_batch(
        n1, n2, T, T, align_different_words=align_different_words, L=L)
    same = (y_pair > 0)[:, None]
    p1 = jnp.where(same, p1s, p1d)
    p2 = jnp.where(same, p2s, p2d)
    plen = jnp.where(y_pair > 0, plen_s, plen_d)
    x1 = gather_aligned(f1, p1)
    x2 = gather_aligned(f2, p2)
    w = ((jnp.arange(L)[None, :] < plen[:, None]).astype(jnp.float32)
         * pair_w[:, None])
    d = x1.shape[-1]
    yb = jnp.broadcast_to(y_pair[:, None], (y_pair.shape[0], L))
    return (x1.reshape(-1, d), x2.reshape(-1, d), yb.reshape(-1),
            w.reshape(-1))


def _bank_align_matrix(bank, ids1, ids2, y_pair, pair_w,
                       align_different_words: bool, mesh=None,
                       max_frames: int = None):
    """Matrix-mode twin of :func:`_bank_align` for mixed same/diff pair
    batches: every pair gets a (T, T) alignment mask — the DTW path mask
    for same pairs, the truncate/diagonal path scattered to a mask for
    diff pairs — selected per pair by the label. Returns
    (frames, w_frames, A, y_cells) with frames = [f1; f2] each token
    exactly once."""
    T = max_frames if max_frames is not None else bank.max_len
    f1, n1 = bank.take(ids1, T)
    f2, n2 = bank.take(ids2, T)
    dist = pairwise_angular_distance(f1, f2)
    A_dtw = dtw_path_from_dist(dist, n1, n2, mesh=mesh)
    A_diff = _diff_mask(n1, n2, jnp.ones_like(pair_w), T, T,
                        align_different_words)
    same = (y_pair > 0)[:, None, None]
    A = jnp.where(same, A_dtw, A_diff) * pair_w[:, None, None]
    d = f1.shape[-1]
    frames = jnp.concatenate([f1.reshape(-1, d), f2.reshape(-1, d)])
    w_frames = jnp.concatenate([A.sum(2).reshape(-1),
                                A.sum(1).reshape(-1)])
    y_cells = jnp.broadcast_to(y_pair[:, None, None], A.shape)
    return frames, w_frames, A, y_cells


def _head_cells(cell_loss, e, B, T1, T2):
    """Per-cell statistics of one head's [e1; e2] rows via the loss's
    decomposition (loss.pair_cells)."""
    e1 = e[:B * T1].reshape(B, T1, -1)
    e2 = e[B * T1:].reshape(B, T2, -1)
    return cell_loss.pair_cells(e1, e2)


def _bank_matrix_value(network, loss, params, state, rng, train, parts,
                       y_spk_pair=None):
    """Embed the unique-frame batch once and reduce the A-weighted
    cosine matrix (mixed-pair matrix mode). ``y_spk_pair`` switches to
    the multitask family: one trunk pass, one cell matrix per head,
    both reduced under the same alignment mask."""
    frames, w_frames, A, y_cells = parts
    B, T1, T2 = A.shape
    if y_spk_pair is not None:
        spk, phn, new_state = network.forward_once(
            params, state, frames, rng=rng, train=train,
            weights=w_frames)
        c_spk = _head_cells(loss.loss_spk, spk, B, T1, T2)
        c_phn = _head_cells(loss.loss_phn, phn, B, T1, T2)
        y_spk_cells = jnp.broadcast_to(y_spk_pair[:, None, None], A.shape)
        return loss.from_cells_multi(c_spk, c_phn, y_spk_cells, y_cells,
                                     weights=A), new_state
    e, new_state = network.forward_once(params, state, frames, rng=rng,
                                        train=train, weights=w_frames)
    cells = _head_cells(loss, e, B, T1, T2)
    return loss.from_cells(cells, y_cells, weights=A), new_state


def _split_bank_align(bank, ids1s, ids2s, ws, ids1d, ids2d, wd,
                      align_different_words, mesh, max_frames):
    """Static same/diff split: DTW DP only over the same-word group; diff
    pairs use the cheap truncate/diagonal alignment at L=T (vs a mixed
    batch paying the quadratic DP and 2T-1 padding for every pair)."""
    T = max_frames if max_frames is not None else bank.max_len
    Ls = 2 * T - 1
    f1s, n1s = bank.take(ids1s, T)
    f2s, n2s = bank.take(ids2s, T)
    dist = pairwise_angular_distance(f1s, f2s)
    p1s, p2s, plen_s = dtw_align_from_dist(dist, n1s, n2s, mesh=mesh)
    x1s = gather_aligned(f1s, p1s)
    x2s = gather_aligned(f2s, p2s)
    wfs = ((jnp.arange(Ls)[None, :] < plen_s[:, None]).astype(jnp.float32)
           * ws[:, None])

    f1d, n1d = bank.take(ids1d, T)
    f2d, n2d = bank.take(ids2d, T)
    p1d, p2d, plen_d = align_diff_batch(
        n1d, n2d, T, T, align_different_words=align_different_words)
    x1d = gather_aligned(f1d, p1d)
    x2d = gather_aligned(f2d, p2d)
    Ld = x1d.shape[1]
    wfd = ((jnp.arange(Ld)[None, :] < plen_d[:, None]).astype(jnp.float32)
           * wd[:, None])

    d = x1s.shape[-1]
    x1 = jnp.concatenate([x1s.reshape(-1, d), x1d.reshape(-1, d)])
    x2 = jnp.concatenate([x2s.reshape(-1, d), x2d.reshape(-1, d)])
    y = jnp.concatenate([jnp.ones(x1s.shape[0] * Ls),
                         -jnp.ones(x1d.shape[0] * Ld)])
    w = jnp.concatenate([wfs.reshape(-1), wfd.reshape(-1)])
    return x1, x2, y, w, Ls, Ld


def make_split_pair_train_step(network, loss, optimizer, bank, mesh: Mesh,
                               align_different_words: bool = False,
                               extra_labels: bool = False,
                               max_frames: int = None,
                               steps_per_call: int = 1,
                               frame_bank=None, tcl: float = 0.0,
                               matrix_loss: Optional[bool] = None):
    """Train/eval steps over SplitBankBatch index batches (static
    same/diff groups). Returns (train_step, eval_step).

    steps_per_call > 1: the train step takes K stacked batches
    (leading axis K on every batch array) and lax.scans K optimizer
    steps in one dispatch — per-dispatch latency amortizes across K.

    frame_bank + tcl > 0: each batch carries a static temporal-coherence
    group of frame-index pairs (4 extra args: i1, i2, y, w); the gathered
    frame pairs join the loss with weights rescaled on device so the tcl
    group carries exactly tcl/(1-tcl) of the token pairs' total weight —
    the reference's mixing fraction (reference dataloader.py:314-322)
    with static shapes.

    matrix_loss: force the matrix-loss path on/off (None = auto, see
    :func:`use_matrix_loss`): the alignment stays a (B, T, T) mask, each
    frame embeds once, and the loss reduces the A-weighted embedding
    cosine matrix — no backtrace walk, no frame gathers."""
    assert not (extra_labels and frame_bank is not None), (
        "tcl mixing is a monotask feature (the reference never combines "
        "it with multitask speaker labels)")
    matrix = use_matrix_loss(loss, extra_labels, matrix_loss)
    n_batch_args = 8 if extra_labels else 6
    if frame_bank is not None:
        assert 0 < tcl < 1
        n_batch_args += 4
    assert steps_per_call >= 1, "steps_per_call must be >= 1"
    K = steps_per_call

    def align(consts, args):
        view, fbank = consts
        tcl_args = None
        if frame_bank is not None:
            args, tcl_args = args[:-4], args[-4:]
        if extra_labels:
            (ids1s, ids2s, ws, ids1d, ids2d, wd, yspk_s, yspk_d) = args
        else:
            ids1s, ids2s, ws, ids1d, ids2d, wd = args
            yspk_s = yspk_d = None
        x1, x2, y, w, Ls, Ld = _split_bank_align(
            view, ids1s, ids2s, ws, ids1d, ids2d, wd,
            align_different_words, mesh, max_frames)
        y_spk = None
        if extra_labels:
            y_spk = jnp.concatenate([
                jnp.repeat(yspk_s, Ls), jnp.repeat(yspk_d, Ld)])
        if tcl_args is not None:
            ti1, ti2, ty, tw = tcl_args
            wt = tw * (tcl / (1.0 - tcl)) * (
                jnp.sum(w) / jnp.maximum(jnp.sum(tw), 1e-6))
            x1 = jnp.concatenate([x1, fbank[ti1]])
            x2 = jnp.concatenate([x2, fbank[ti2]])
            y = jnp.concatenate([y, ty])
            w = jnp.concatenate([w, wt])
        return x1, x2, y, w, y_spk

    def matrix_parts(consts, args):
        """Matrix-mode batch assembly: unique frames + visit weights +
        alignment masks (see use_matrix_loss)."""
        view, fbank = consts
        tcl_args = None
        if frame_bank is not None:
            args, tcl_args = args[:-4], args[-4:]
        if extra_labels:
            (ids1s, ids2s, ws, ids1d, ids2d, wd,
             yspk_s, yspk_d) = args
        else:
            ids1s, ids2s, ws, ids1d, ids2d, wd = args
            yspk_s = yspk_d = None
        Tb = max_frames if max_frames is not None else bank.max_len
        f1s, n1s = view.take(ids1s, Tb)
        f2s, n2s = view.take(ids2s, Tb)
        f1d, n1d = view.take(ids1d, Tb)
        f2d, n2d = view.take(ids2d, Tb)
        frames, w_frames, A_s, A_d_parts = _matrix_same_diff_parts(
            f1s, f2s, n1s, n2s, ws, f1d, f2d, n1d, n2d, wd,
            align_different_words, mesh)
        tcl_terms = None
        if tcl_args is not None:
            ti1, ti2, ty, tw = tcl_args
            wt = tw * (tcl / (1.0 - tcl)) * (
                (A_s.sum() + A_d_parts[0].sum())
                / jnp.maximum(jnp.sum(tw), 1e-6))
            frames = jnp.concatenate(
                [frames, fbank[ti1], fbank[ti2]])
            w_frames = jnp.concatenate([w_frames, wt, wt])
            tcl_terms = (ty, wt, ti1.shape[0])
        return frames, w_frames, A_s, A_d_parts, tcl_terms, yspk_s, yspk_d

    def matrix_value(p, state, rng, train, parts):
        frames, w_frames, A_s, A_d_parts, tcl_terms, yspk_s, yspk_d = \
            parts
        if extra_labels:
            spk, phn, new_state = network.forward_once(
                p, state, frames, rng=rng, train=train, weights=w_frames)
            c_spk, y_spk, w, _ = _matrix_cell_terms(
                loss.loss_spk, spk, A_s, A_d_parts,
                y_s=yspk_s, y_d=yspk_d)
            c_phn, y_phn, _, _ = _matrix_cell_terms(
                loss.loss_phn, phn, A_s, A_d_parts)
            return loss.from_cells_multi(c_spk, c_phn, y_spk, y_phn,
                                         weights=w), new_state
        e, new_state = network.forward_once(p, state, frames, rng=rng,
                                            train=train, weights=w_frames)
        A_d = A_d_parts[0]
        if A_d.ndim == 2:
            # truncate mode: the same-group loss is affine in the cell
            # statistics, so it folds into masked matmuls
            # (loss.masked_same_sum) — the O(B*T^2) cell matrix never
            # materializes (perf-neutral at T=96 where the A-weighted
            # backward matmuls dominate either way; memory win grows
            # with T); only the diagonal diff terms (and tcl) stay
            # elementwise
            e1s, e2s, e1d, e2d, rest = _split_group_rows(
                e, A_s, A_d_parts)
            same_sum = loss.masked_same_sum(e1s, e2s, A_s)
            same_w = jnp.sum(A_s)
            Tm = A_d.shape[1]
            d_e = e1d.shape[-1]
            c_rest = loss.rowwise_cells(e1d[:, :Tm].reshape(-1, d_e),
                                        e2d[:, :Tm].reshape(-1, d_e))
            y_rest = -jnp.ones(A_d.size)
            w_rest = A_d.reshape(-1)
            if tcl_terms is not None:
                ty, wt, n_tcl = tcl_terms
                ct = loss.rowwise_cells(rest[:n_tcl], rest[n_tcl:])
                c_rest = jnp.concatenate([c_rest, ct], axis=-1)
                y_rest = jnp.concatenate([y_rest, ty])
                w_rest = jnp.concatenate([w_rest, wt])
            return loss.from_parts(same_sum, same_w, c_rest, y_rest,
                                   w_rest), new_state
        c, y, w, rest = _matrix_cell_terms(loss, e, A_s, A_d_parts)
        if tcl_terms is not None:
            ty, wt, n_tcl = tcl_terms
            ct = loss.rowwise_cells(rest[:n_tcl], rest[n_tcl:])
            c = jnp.concatenate([c, ct], axis=-1)
            y = jnp.concatenate([y, ty])
            w = jnp.concatenate([w, wt])
        return loss.from_cells(c, y, weights=w), new_state

    if matrix:
        def one_step(consts, params, state, opt_state, rng, args):
            parts = matrix_parts(consts, args)

            def loss_fn(p):
                return matrix_value(p, state, rng, True, parts)

            (value, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = opt_update(optimizer, grads, opt_state,
                                          params, value,
                                          lambda q: loss_fn(q)[0])
            return (optax.apply_updates(params, updates), new_state,
                    new_opt, value)
    else:
        def one_step(consts, params, state, opt_state, rng, args):
            x1, x2, y, w, y_spk = align(consts, args)

            def loss_fn(p):
                if extra_labels:
                    spk1, phn1, spk2, phn2, new_state = network.forward(
                        p, state, x1, x2, rng=rng, train=True, weights=w)
                    return loss(spk1, phn1, spk2, phn2, y_spk, y,
                                weights=w), new_state
                e1, e2, new_state = network.forward(p, state, x1, x2,
                                                    rng=rng, train=True,
                                                    weights=w)
                return loss(e1, e2, y, weights=w), new_state

            (value, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = opt_update(optimizer, grads, opt_state,
                                          params, value,
                                          lambda q: loss_fn(q)[0])
            return (optax.apply_updates(params, updates), new_state,
                    new_opt, value)

    if matrix:
        def eval_step(consts, params, state, *args):
            value, _ = matrix_value(params, state, None, False,
                                    matrix_parts(consts, args))
            return value
    else:
        def eval_step(consts, params, state, *args):
            x1, x2, y, w, y_spk = align(consts, args)
            if extra_labels:
                spk1, phn1, spk2, phn2, _ = network.forward(
                    params, state, x1, x2, train=False)
                return loss(spk1, phn1, spk2, phn2, y_spk, y, weights=w)
            e1, e2, _ = network.forward(params, state, x1, x2, train=False)
            return loss(e1, e2, y, weights=w)

    n_tok_args = n_batch_args - (4 if frame_bank is not None else 0)

    def fill_for(i):
        if i in (2, 5) or i >= n_tok_args + 2:  # weights / tcl y,w
            return 0.0
        if extra_labels and i >= 6:  # spk labels
            return 1.0
        return 0  # token / tcl frame ids

    return _chain_steps(one_step, eval_step, mesh, n_batch_args, K,
                        fill_for, consts=(bank.view(), frame_bank))


def _sampled_prepare(bank, sampler, mesh, align_different_words, matrix,
                     extra_labels, rng_sample):
    """Sample a fresh pair batch on device and align it — everything
    that does NOT depend on the parameters. Kept outside the loss
    closure so an LBFGS linesearch (which re-evaluates value_fn several
    times per update) reuses one sampling + DTW alignment instead of
    re-running them per evaluation."""
    sampled = sampler.sample(rng_sample, with_speakers=extra_labels)
    if extra_labels:
        ids1, ids2, y_pair, y_spk_pair = sampled
    else:
        (ids1, ids2, y_pair), y_spk_pair = sampled, None
    pair_w = jnp.ones_like(y_pair)
    if matrix:
        parts = _bank_align_matrix(bank, ids1, ids2, y_pair, pair_w,
                                   align_different_words, mesh)
        return ("matrix", parts, y_spk_pair)
    x1, x2, y, w = _bank_align(bank, ids1, ids2, y_pair, pair_w,
                               align_different_words, mesh)
    return ("gather", (x1, x2, y, w, y_pair.shape[0]), y_spk_pair)


def _sampled_apply(network, loss, prep, params, state, rng_drop, train):
    """Loss of a prepared sampled batch (the parameter-dependent half of
    the sampled step; extra_labels is implied by prep's y_spk_pair)."""
    mode, data, y_spk_pair = prep
    if mode == "matrix":
        return _bank_matrix_value(network, loss, params, state, rng_drop,
                                  train, data, y_spk_pair=y_spk_pair)
    x1, x2, y, w, B = data
    if y_spk_pair is not None:
        L = x1.shape[0] // B
        y_spk = jnp.broadcast_to(y_spk_pair[:, None], (B, L)).reshape(-1)
        spk1, phn1, spk2, phn2, new_state = network.forward(
            params, state, x1, x2, rng=rng_drop, train=train, weights=w)
        return loss(spk1, phn1, spk2, phn2, y_spk, y,
                    weights=w), new_state
    e1, e2, new_state = network.forward(params, state, x1, x2,
                                        rng=rng_drop, train=train,
                                        weights=w)
    return loss(e1, e2, y, weights=w), new_state


def make_sampled_train_step(network, loss, optimizer, bank, sampler,
                            mesh: Mesh,
                            align_different_words: bool = False,
                            steps_per_call: int = 1,
                            matrix_loss: Optional[bool] = None,
                            extra_labels: bool = False):
    """The fully on-device pipeline: one jitted call that SAMPLES fresh
    pair batches (DevicePairSampler), gathers tokens from the HBM-resident
    bank, DTW-aligns, and trains — per call the host sends a PRNG key and
    receives a scalar loss; nothing else crosses the host-device boundary.

    steps_per_call > 1 chains that many optimizer steps in one lax.scan'd
    dispatch: through high-latency runtimes (this repo's TPU tunnel costs
    tens of ms per dispatch) the per-step overhead divides by K.

    extra_labels trains the multitask family: the sampler emits the
    +1/-1 speaker labels alongside the type labels (static per sampling
    config) and the step computes weighted_loss_multi over both heads.
    """
    assert steps_per_call >= 1, "steps_per_call must be >= 1"
    rep = NamedSharding(mesh, P())
    if mesh.size > 1:
        assert sampler.batch_size % mesh.shape["data"] == 0, (
            "sampler batch_size must divide the mesh 'data' axis so the "
            "sharded Pallas DTW kernel gets equal per-device blocks")

    matrix = use_matrix_loss(loss, extra_labels, matrix_loss)

    def one_step(consts, params, state, opt_state, rng):
        view, s_view = consts
        rng_sample, rng_drop = jax.random.split(rng)
        prep = _sampled_prepare(view, s_view if s_view is not None
                                else sampler, mesh,
                                align_different_words, matrix,
                                extra_labels, rng_sample)

        def loss_fn(p):
            return _sampled_apply(network, loss, prep, p, state,
                                  rng_drop, True)

        (value, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = opt_update(optimizer, grads, opt_state,
                                      params, value,
                                      lambda q: loss_fn(q)[0])
        return (optax.apply_updates(params, updates), new_state, new_opt,
                value)

    if steps_per_call == 1:
        step = one_step
    else:
        def step(consts, params, state, opt_state, rng):
            def body(carry, k):
                p, s, o = carry
                p, s, o, v = one_step(consts, p, s, o,
                                      jax.random.fold_in(rng, k))
                return (p, s, o), v
            (params, state, opt_state), values = jax.lax.scan(
                body, (params, state, opt_state),
                jnp.arange(steps_per_call))
            return params, state, opt_state, jnp.mean(values)

    cache = {}
    consts = (bank.view(),
              sampler.view() if hasattr(sampler, "view") else None)

    def compiled(params, state, opt_state, rng):
        params, state, opt_state = _steady_place(cache, mesh, params,
                                                 state, opt_state)
        fn = _cached_jit(cache, "jit", lambda: jax.jit(
            step, in_shardings=(rep, cache["p_shard"], cache["s_shard"],
                                cache["o_shard"], rep),
            out_shardings=(cache["p_shard"], cache["s_shard"],
                           cache["o_shard"], None)))
        return fn(_placed_consts(cache, mesh, consts), params,
                  state, opt_state, rng)

    return compiled


def make_sampled_eval_step(network, loss, bank, sampler, mesh: Mesh,
                           align_different_words: bool = False,
                           matrix_loss: Optional[bool] = None,
                           steps_per_call: int = 1,
                           extra_labels: bool = False):
    """Eval twin of make_sampled_train_step: sample + align + loss, no
    gradient/update.

    steps_per_call > 1 scans that many freshly-sampled eval batches in
    one dispatch and returns the (K,) per-batch losses — the dev pass
    amortizes the per-dispatch latency exactly like the train pass
    (round-2 review weak #5: the one-eval-per-dispatch dev pass
    dominated small-epoch wall-clock through a ~50 ms-dispatch link)."""
    rep = NamedSharding(mesh, P())
    matrix = use_matrix_loss(loss, extra_labels, matrix_loss)
    assert steps_per_call >= 1, "steps_per_call must be >= 1"

    if mesh.size > 1:
        assert sampler.batch_size % mesh.shape["data"] == 0, (
            "sampler batch_size must divide the mesh 'data' axis so the "
            "sharded Pallas DTW kernel gets equal per-device blocks")

    def one(consts, params, state, rng):
        view, s_view = consts
        prep = _sampled_prepare(view, s_view if s_view is not None
                                else sampler, mesh,
                                align_different_words, matrix,
                                extra_labels, rng)
        value, _ = _sampled_apply(network, loss, prep, params, state,
                                  None, False)
        return value

    if steps_per_call == 1:
        step = one
    else:
        def step(consts, params, state, rng):
            def body(_, k):
                return None, one(consts, params, state,
                                 jax.random.fold_in(rng, k))
            _, values = jax.lax.scan(body, None,
                                     jnp.arange(steps_per_call))
            return values

    cache = {}
    consts = (bank.view(),
              sampler.view() if hasattr(sampler, "view") else None)

    def compiled(params, state, rng):
        params, state = _steady_place(cache, mesh, params, state)
        fn = _cached_jit(cache, "jit", lambda: jax.jit(
            step, in_shardings=(rep, cache["p_shard"], cache["s_shard"],
                                rep)))
        return fn(_placed_consts(cache, mesh, consts), params,
                  state, rng)

    return compiled


def make_pair_train_step(network, loss, optimizer, bank, mesh: Mesh,
                         align_different_words: bool = False,
                         extra_labels: bool = False,
                         max_frames: int = None,
                         matrix_loss: Optional[bool] = None,
                         steps_per_call: int = 1,
                         frame_bank=None, tcl: float = 0.0):
    """Uniform fused train step over a TokenBank: every pair is (id1, id2,
    y, pair_weight) — same-word pairs (y=+1) are DTW-aligned, diff-word
    pairs (y=-1) truncate/diagonal-aligned, selected per pair with a
    where(); padded pairs carry pair_weight 0. Fixed pair-batch shape ->
    one compiled step for the whole training run.

    extra_labels adds a second per-pair label stream (speaker labels for
    the multitask network); the step then returns the multitask loss.

    steps_per_call > 1: like make_split_pair_train_step, the train step
    takes K stacked batches (leading axis K on every batch array) and
    lax.scans K optimizer steps in one dispatch; the eval twin scans K
    losses per dispatch (returns the (K,) per-batch values).

    frame_bank + tcl > 0 (monotask only): each batch carries a
    temporal-coherence group of frame-index pairs (4 extra args: i1, i2,
    y, w) mixed into the loss at exactly the tcl/(1-tcl) weight fraction
    — the same contract as the split factory, so the non-split bank
    path supports tcl too (reference dataloader.py:314-322)."""
    T = max_frames if max_frames is not None else bank.max_len
    L = 2 * T - 1
    matrix = use_matrix_loss(loss, extra_labels, matrix_loss)
    assert not (extra_labels and frame_bank is not None), (
        "tcl mixing is a monotask feature (the reference never combines "
        "it with multitask speaker labels)")
    n_batch_args = 5 if extra_labels else 4
    if frame_bank is not None:
        assert 0 < tcl < 1
        n_batch_args += 4
    assert steps_per_call >= 1, "steps_per_call must be >= 1"
    K = steps_per_call

    def split_args(args):
        tcl_args = None
        if frame_bank is not None:
            args, tcl_args = args[:-4], args[-4:]
        if extra_labels:
            ids1, ids2, y_pair, y_spk_pair, pair_w = args
        else:
            ids1, ids2, y_pair, pair_w = args
            y_spk_pair = None
        return ids1, ids2, y_pair, y_spk_pair, pair_w, tcl_args

    # prepare/apply split: sampling-independent of params, the DTW
    # alignment (the quadratic DP) happens ONCE per step in prepare();
    # the loss closure the optimizer re-evaluates (LBFGS's zoom
    # linesearch calls value_fn several times inside a while_loop, where
    # XLA cannot CSE across iterations) only runs the parameter-dependent
    # half (round-3 review weak #4; the _sampled_prepare/_sampled_apply
    # pattern above).

    def gather_prepare(consts, args):
        view, fbank = consts
        ids1, ids2, y_pair, y_spk_pair, pair_w, tcl_args = \
            split_args(args)
        x1, x2, y, w = _bank_align(view, ids1, ids2, y_pair, pair_w,
                                   align_different_words, mesh,
                                   max_frames=max_frames)
        if tcl_args is not None:
            ti1, ti2, ty, tw = tcl_args
            wt = tw * (tcl / (1.0 - tcl)) * (
                jnp.sum(w) / jnp.maximum(jnp.sum(tw), 1e-6))
            x1 = jnp.concatenate([x1, fbank[ti1]])
            x2 = jnp.concatenate([x2, fbank[ti2]])
            y = jnp.concatenate([y, ty])
            w = jnp.concatenate([w, wt])
        y_spk = None
        if extra_labels:
            y_spk = jnp.broadcast_to(
                y_spk_pair[:, None], (y_spk_pair.shape[0], L)).reshape(-1)
        return x1, x2, y, w, y_spk

    def gather_apply(p, state, rng, train, prep):
        x1, x2, y, w, y_spk = prep
        if y_spk is not None:
            spk1, phn1, spk2, phn2, new_state = network.forward(
                p, state, x1, x2, rng=rng, train=train, weights=w)
            return loss(spk1, phn1, spk2, phn2, y_spk, y,
                        weights=w), new_state
        e1, e2, new_state = network.forward(p, state, x1, x2, rng=rng,
                                            train=train, weights=w)
        return loss(e1, e2, y, weights=w), new_state

    def matrix_prepare(consts, args):
        view, fbank = consts
        ids1, ids2, y_pair, y_spk_pair, pair_w, tcl_args = \
            split_args(args)
        frames, w_frames, A, y_cells = _bank_align_matrix(
            view, ids1, ids2, y_pair, pair_w, align_different_words,
            mesh, max_frames=max_frames)
        n_tok = frames.shape[0]
        tcl_terms = None
        if tcl_args is not None:
            ti1, ti2, ty, tw = tcl_args
            wt = tw * (tcl / (1.0 - tcl)) * (
                A.sum() / jnp.maximum(jnp.sum(tw), 1e-6))
            frames = jnp.concatenate(
                [frames, fbank[ti1], fbank[ti2]])
            w_frames = jnp.concatenate([w_frames, wt, wt])
            tcl_terms = (ty, wt, ti1.shape[0])
        return frames, w_frames, A, y_cells, n_tok, y_spk_pair, tcl_terms

    def matrix_apply(p, state, rng, train, prep):
        frames, w_frames, A, y_cells, n_tok, y_spk_pair, tcl_terms = prep
        B_, T1, T2 = A.shape
        if extra_labels:
            spk, phn, new_state = network.forward_once(
                p, state, frames, rng=rng, train=train, weights=w_frames)
            c_spk = _head_cells(loss.loss_spk, spk[:n_tok], B_, T1, T2)
            c_phn = _head_cells(loss.loss_phn, phn[:n_tok], B_, T1, T2)
            y_spk_cells = jnp.broadcast_to(
                y_spk_pair[:, None, None], A.shape)
            return loss.from_cells_multi(c_spk, c_phn, y_spk_cells,
                                         y_cells, weights=A), new_state
        e, new_state = network.forward_once(p, state, frames, rng=rng,
                                            train=train, weights=w_frames)
        cells = _head_cells(loss, e[:n_tok], B_, T1, T2)
        if tcl_terms is None:
            return loss.from_cells(cells, y_cells, weights=A), new_state
        ty, wt, n_tcl = tcl_terms
        stat = cells.shape[:-3]
        ct = loss.rowwise_cells(e[n_tok:n_tok + n_tcl],
                                e[n_tok + n_tcl:])
        c = jnp.concatenate([cells.reshape(stat + (-1,)), ct], axis=-1)
        y = jnp.concatenate([y_cells.reshape(-1), ty])
        w = jnp.concatenate([A.reshape(-1), wt])
        return loss.from_cells(c, y, weights=w), new_state

    prepare = matrix_prepare if matrix else gather_prepare
    apply_fn = matrix_apply if matrix else gather_apply

    def one_step(consts, params, state, opt_state, rng, args):
        prep = prepare(consts, args)

        def loss_fn(p):
            return apply_fn(p, state, rng, True, prep)

        (value, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = opt_update(optimizer, grads, opt_state,
                                      params, value,
                                      lambda q: loss_fn(q)[0])
        return (optax.apply_updates(params, updates), new_state,
                new_opt, value)

    def eval_step(consts, params, state, *args):
        value, _ = apply_fn(params, state, None, False,
                            prepare(consts, args))
        return value

    n_tok_args = n_batch_args - (4 if frame_bank is not None else 0)
    w_idx = n_tok_args - 1  # pair_w is the last token-batch arg

    def fill_for(i):
        if i == w_idx or i >= n_tok_args + 2:  # weights / tcl y,w
            return 0.0
        if i in (2, 3) and i < w_idx:  # y / spk labels
            return 1.0
        return 0  # token / tcl frame ids

    return _chain_steps(one_step, eval_step, mesh, n_batch_args, K,
                        fill_for, consts=(bank.view(), frame_bank))


def make_frame_train_step(network, loss, optimizer, tables, mesh: Mesh,
                          steps_per_call: int = 1,
                          multimodal: bool = False):
    """Index-gather train/eval steps over device-resident frame tables
    (FrameBankBatch): the corpus lives in HBM once; the host streams
    only int32 row-index batches and X1/X2 gather inside the jitted
    step — no per-batch feature h2d (round-2 weak #4: the Frames /
    Multimodal / TemporalCoherence loaders shipped the frame features
    themselves with every batch, 30-100 ms of h2d per ~0.5 ms step
    through a slow link).

    tables: one (N, d) array per modality (device-resident);
    multimodal=True passes per-modality lists to network.forward
    (MultimodalSiameseNetwork). steps_per_call > 1 chains K batches per
    dispatch like the bank factories. Returns (train_step, eval_step);
    with K > 1 the eval step takes K stacked batches and returns the
    (K,) losses."""
    tables = tuple(tables)
    assert steps_per_call >= 1, "steps_per_call must be >= 1"
    K = steps_per_call

    def gather(tbls, i):
        xs = [t[i] for t in tbls]
        return list(xs) if multimodal else xs[0]

    def value_fn(tbls, p, state, rng, train, args):
        i1, i2, y, w = args
        x1, x2 = gather(tbls, i1), gather(tbls, i2)
        # weights flow through both network families: padded weight-0
        # rows must stay out of the batch-norm statistics
        e1, e2, new_state = network.forward(p, state, x1, x2, rng=rng,
                                            train=train, weights=w)
        return loss(e1, e2, y, weights=w), new_state

    def one_step(consts, params, state, opt_state, rng, args):
        def loss_fn(p):
            return value_fn(consts, p, state, rng, True, args)

        (value, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = opt_update(optimizer, grads, opt_state,
                                      params, value,
                                      lambda q: loss_fn(q)[0])
        return (optax.apply_updates(params, updates), new_state,
                new_opt, value)

    def eval_step(consts, params, state, *args):
        value, _ = value_fn(consts, params, state, None, False, args)
        return value

    def fill_for(i):  # (i1, i2, y, w)
        return 0.0 if i == 3 else (1.0 if i == 2 else 0)

    return _chain_steps(one_step, eval_step, mesh, 4, K, fill_for,
                        consts=tables)


def make_fused_train_step(network, loss, optimizer, mesh: Mesh,
                          matrix_loss: Optional[bool] = None):
    """One jitted SPMD training step over raw padded pair batches.

    Inputs per step (all sharded over 'data' on their leading pair axis):
    - f1s, f2s (Bs, Ts, d), n1s, n2s (Bs,): same-word pairs -> DTW align
    - f1d, f2d (Bd, Td, d), n1d, n2d (Bd,): diff-word pairs -> truncate

    Everything after the host padding — cost matrices, DP, alignment,
    both towers, loss, backward, optimizer update — is one XLA
    computation; GSPMD all-reduces the gradients over ICI. With
    matrix_loss (auto-on for the cosine losses, see use_matrix_loss) the
    alignment stays a mask over the embedding cosine matrix; otherwise
    frames are gathered along backtraced paths.
    """
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    matrix = use_matrix_loss(loss, override=matrix_loss)

    def step(params, state, opt_state, rng,
             f1s, f2s, n1s, n2s, f1d, f2d, n1d, n2d):
        if matrix:
            ws = jnp.ones(f1s.shape[0], jnp.float32)
            wd = jnp.ones(f1d.shape[0], jnp.float32)
            frames, w_frames, A_s, A_d = _matrix_same_diff_parts(
                f1s, f2s, n1s, n2s, ws, f1d, f2d, n1d, n2d, wd,
                False, mesh)

            def loss_fn(p):
                e, new_state = network.forward_once(
                    p, state, frames, rng=rng, train=True,
                    weights=w_frames)
                c, y, w, _ = _matrix_cell_terms(loss, e, A_s, A_d)
                return loss.from_cells(c, y, weights=w), new_state
        else:
            x1, x2, y, w = _align_and_flatten(network, loss, f1s, f2s,
                                              n1s, n2s, f1d, f2d, n1d,
                                              n2d, mesh=mesh)

            def loss_fn(p):
                e1, e2, new_state = network.forward(p, state, x1, x2,
                                                    rng=rng, train=True,
                                                    weights=w)
                return loss(e1, e2, y, weights=w), new_state

        (value, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = opt_update(optimizer, grads, opt_state,
                                      params, value,
                                      lambda q: loss_fn(q)[0])
        return optax.apply_updates(params, updates), new_state, new_opt, \
            value

    # params carry an explicit TP sharding; optimizer moments mirror the
    # param layout (mirror_shardings); batch arrays are annotated
    # data-parallel. in/out shardings pin the training state to one
    # placement so the step is placement-stable across iterations (no
    # per-step resharding, one jit cache key — see _steady_place).
    cache = {}

    def compiled(params, state, opt_state, rng, *batch):
        params, state, opt_state = _steady_place(cache, mesh, params,
                                                 state, opt_state)
        fn = _cached_jit(cache, "jit", lambda: jax.jit(
            step,
            in_shardings=(cache["p_shard"], cache["s_shard"],
                          cache["o_shard"], rep) + (dp,) * 8,
            out_shardings=(cache["p_shard"], cache["s_shard"],
                           cache["o_shard"], None)))
        return fn(params, state, opt_state, rng, *batch)

    return compiled
