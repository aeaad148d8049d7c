#!/usr/bin/env python3
"""Trainers: epoch loop + early stopping around one jitted train step.

Parity with the reference trainer surface (reference trainer.py:32-365):
optimizers {sgd, adadelta, adam, adagrad, RMSprop, LBFGS}, dev-loss early
stopping with patience, an epoch-0 eval-only pass, best-network checkpoints
+ pickled ``whoami`` params, TensorBoard train/dev scalars.

TPU-first redesign: forward-both-towers + loss + backward + optimizer
update is **one jitted function** over device-resident (params, state,
opt_state); batches stream from the dataloader through a prefetch thread;
batch rows are padded to power-of-two buckets so XLA compiles a handful of
step variants instead of one per shape (the reference pays a host->device
transfer and separate kernel launches per stage, reference
trainer.py:211-242).
"""

from __future__ import annotations

import os
import pickle
import time
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np
import optax

from abnet3_tpu.dataloader import Batch, prefetch_iterator
from abnet3_tpu.parallel.mesh import opt_update

__all__ = ["TrainerBuilder", "TrainerSiamese", "TrainerSiameseMultitask",
           "MultimodalTrainer", "build_optimizer", "MetricsWriter"]


def _finite_step_guard(inner):
    """Drop optimizer steps that PRODUCE nonfinite updates or state.

    optax.apply_if_finite only checks the INCOMING grads, but LBFGS's
    zoom linesearch can turn finite grads into NaN updates (degenerate
    curvature once a small objective is nearly minimized), silently
    poisoning the params and the L-BFGS history for the rest of the run.
    This wrapper runs the inner update, checks finiteness of everything
    it produced, and on failure returns zero updates and the PREVIOUS
    state. The state tree is the inner's own — no extra leaves — so
    checkpoints stay structure-compatible with the bare optimizer.
    Rejection keeps the old state, so a transient NaN (one bad batch /
    linesearch) costs one skipped step; a persistently-NaN objective
    plateaus and trips early stopping instead of training on garbage."""
    inner = optax.with_extra_args_support(inner)

    def init(params):
        return inner.init(params)

    def update(grads, state, params=None, **extra):
        updates, new_state = inner.update(grads, state, params, **extra)
        leaves = [jnp.asarray(l) for l in
                  jax.tree_util.tree_leaves((updates, new_state))]
        checks = [jnp.all(jnp.isfinite(l)) for l in leaves
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        ok = jnp.all(jnp.stack(checks)) if checks \
            else jnp.asarray(True)
        safe_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        safe_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_state, state)
        return safe_updates, safe_state

    return optax.GradientTransformationExtraArgs(init, update)


def build_optimizer(optimizer_type: str, lr: float, momentum: float = 0.9):
    """The reference's optimizer zoo via optax
    (reference trainer.py:68-87).

    LBFGS keeps optax's default zoom linesearch — the closure-mode
    contract of torch's LBFGS (the reference's optimize_model re-
    evaluates the loss through the closure): every train step passes
    (value, grad, value_fn) extra args to optimizer.update
    (parallel.mesh.opt_update), which the linesearch consumes and every
    other optax transform ignores. ``linesearch=None`` is NOT a
    substitute: it diverges on the siamese losses (measured flat at
    chance loss where zoom-LBFGS beats adam).

    LBFGS is wrapped in _finite_step_guard: a degenerate step (zero
    curvature / flat zoom linesearch once a tiny objective is nearly
    minimized) can emit NaN grads or NaN updates, which would silently
    poison the params AND the L-BFGS history for the rest of the run —
    the guard checks what the update PRODUCED (optax.apply_if_finite
    only checks the incoming grads) and drops the step, keeping the
    previous state (torch's LBFGS guards the same divisions
    internally). The guard adds no state leaves, so LBFGS checkpoints
    resume across builds with and without it."""
    assert optimizer_type in ("sgd", "adadelta", "adam", "adagrad",
                              "RMSprop", "LBFGS")
    if optimizer_type == "sgd":
        return optax.sgd(lr, momentum=momentum)
    if optimizer_type == "adadelta":
        return optax.adadelta(lr)
    if optimizer_type == "adam":
        return optax.adam(lr)
    if optimizer_type == "adagrad":
        return optax.adagrad(lr)
    if optimizer_type == "RMSprop":
        return optax.rmsprop(lr)
    return _finite_step_guard(optax.lbfgs(lr))


class MetricsWriter:
    """TensorBoard scalar writer with a JSONL fallback
    (reference logs via tensorboardX, reference trainer.py:132-152)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(log_dir=str(log_dir))
        except Exception:
            pass
        self._jsonl = open(os.path.join(str(log_dir), "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write('{"tag": "%s", "value": %r, "step": %d}\n'
                          % (tag, float(value), step))
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


from abnet3_tpu.utils import pow2_bucket  # noqa: E402


def _round_bucket(n: int, minimum: int = 256) -> int:
    return pow2_bucket(n, minimum)


class TrainerBuilder:
    """Generic trainer (reference trainer.py:32-200)."""

    def __init__(self, network=None, loss=None,
                 num_epochs=200, patience=20,
                 optimizer_type="sgd", lr=0.001, momentum=0.9, cuda=True,
                 seed=0, dataloader=None, log_dir=None,
                 feature_generator=None, checkpoints=False,
                 prefetch=2, mesh=None, matrix_loss=None):
        self.network = network
        self.loss = loss
        self.num_epochs = num_epochs
        self.patience = patience
        self.lr = lr
        self.momentum = momentum
        self.best_epoch = 0
        self.seed = seed
        self.cuda = cuda  # kept for YAML compat; devices come from jax
        self.statistics_training = {}
        self.dataloader = dataloader
        self.feature_generator = feature_generator
        self.checkpoints = checkpoints
        self.prefetch = prefetch
        self.optimizer_type = optimizer_type
        # matrix_loss: force the matrix-loss alignment path on/off for
        # the bank step factories (None = auto, parallel.use_matrix_loss)
        self.matrix_loss = matrix_loss
        # mesh: a jax.sharding.Mesh, or a YAML-friendly dict
        # {"data": N, "model": M} built over the available devices
        if isinstance(mesh, dict):
            from abnet3_tpu.parallel import make_mesh
            mesh = make_mesh(n_data=mesh.get("data"),
                             n_model=mesh.get("model", 1))
        self.mesh = mesh

        if log_dir is None:
            self.log_dir = Path("./runs/%s"
                                % time.strftime("%m-%d-%Hh%M-%S"))
        else:
            self.log_dir = Path(log_dir) / (
                "%s" % time.strftime("%m-%d-%Hh%M-%S"))
        self.optimizer = build_optimizer(optimizer_type, lr, momentum)
        self._opt_state = None
        self._step_fns = {}

    # -- bookkeeping -------------------------------------------------------

    def params(self):
        skip = {"dataloader", "feature_generator", "network", "loss",
                "optimizer", "statistics_training", "mesh"}
        out = {k: v for k, v in self.__dict__.items()
               if not k.startswith("_") and k not in skip}
        out["mesh"] = (str(dict(self.mesh.shape))
                       if self.mesh is not None else None)
        return out

    def whoami(self):
        whoami = {
            "params": self.params(),
            "network": self.network.whoami(),
            "loss": self.loss.whoami(),
            "class_name": self.__class__.__name__,
            "dataloader": self.dataloader.whoami(),
            "feature_generator": (self.feature_generator.whoami()
                                  if self.feature_generator is not None
                                  else None),
        }
        return whoami

    def save_whoami(self):
        state = {k: (str(v) if isinstance(v, Path) else v)
                 for k, v in self.whoami().items()}
        with open(self.network.output_path + ".params", "wb") as fh:
            pickle.dump(state, fh)

    def optimize_model(self, do_training=True):
        raise NotImplementedError("Unimplemented optimize_model for class:",
                                  self.__class__.__name__)

    def _prewarm_chain_steps(self):
        """Subclasses with chained bank/frame steps overlap their
        per-bucket executable compiles here; base: nothing to warm."""

    # -- checkpoint / resume ----------------------------------------------
    # The reference only saves best-network weights (no resume, reference
    # trainer.py:154-162); here the full training state (params, batch-norm
    # state, optimizer state, early-stopping counters, loss history)
    # round-trips through one checkpoint file.

    @property
    def _ckpt_path(self):
        return self.network.output_path + ".ckpt"

    def save_checkpoint(self, epoch: int):
        from abnet3_tpu.serialize import save_pytree
        tree = {"params": self.network.params,
                "state": self.network.state,
                "opt_state": self._opt_state}
        meta = {"epoch": epoch,
                "best_dev": self.best_dev,
                # best_dev is the per-batch MEAN dev loss (a summed value
                # would break resume comparability when dev-batch-count
                # knobs like num_max_minibatches change between runs)
                "best_dev_is_mean": True,
                "patience_dev": self.patience_dev,
                "best_epoch": self.best_epoch,
                "train_losses": [float(x) for x in self.train_losses],
                "dev_losses": [float(x) for x in self.dev_losses]}
        meta.update(self._extra_ckpt_meta())
        save_pytree(self._ckpt_path, tree, meta)

    def _extra_ckpt_meta(self):
        return {}

    def _restore_extra_meta(self, meta):
        pass

    def _checkpoint_optimizer(self):
        """Optimizer whose state structure the checkpoint holds
        (subclasses with wrapped optimizers override)."""
        return self.optimizer

    def load_checkpoint(self) -> int:
        """Restore full training state; returns the next epoch index."""
        from abnet3_tpu.serialize import load_pytree
        tree, meta = load_pytree(self._ckpt_path)
        self.network.params = jax.tree_util.tree_map(jnp.asarray,
                                                     tree["params"])
        self.network.state = jax.tree_util.tree_map(
            jnp.asarray, tree.get("state", {}))
        self._restore_extra_meta(meta)
        # optimizer state: restore leaves into a freshly-built structure
        template = self._checkpoint_optimizer().init(self.network.params)
        saved_leaves = jax.tree_util.tree_leaves(tree["opt_state"])
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        assert len(saved_leaves) == len(t_leaves), \
            "checkpoint optimizer state does not match the optimizer"
        self._opt_state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(s) for s in saved_leaves])
        # pre-mean checkpoints stored the summed dev loss; a sum is not
        # comparable with the means computed after resume — drop it and
        # let the first post-resume epoch re-establish the best
        self.best_dev = (meta["best_dev"]
                         if meta.get("best_dev_is_mean") else None)
        self.patience_dev = meta["patience_dev"]
        self.best_epoch = meta["best_epoch"]
        self.train_losses = list(meta["train_losses"])
        self.dev_losses = list(meta["dev_losses"])
        return int(meta["epoch"]) + 1

    # -- training loop ------------------------------------------------------

    def train(self, resume=False):
        """Early-stopping epoch loop (reference trainer.py:117-173).

        resume=True restores the latest checkpoint (if present) and
        continues from the next epoch."""
        self.patience_dev = 0
        self.best_dev = None
        self.train_losses = []
        self.dev_losses = []
        start_epoch = 0

        self.network.ensure_init(self.seed)

        train_writer = MetricsWriter(str(self.log_dir / "train_loss"))
        dev_writer = MetricsWriter(str(self.log_dir / "dev_loss"))

        resumed = resume and os.path.exists(self._ckpt_path)
        if resumed:
            # restore BEFORE prewarm: the warm calls cache step closures
            # built from the current optimizer config (e.g. the
            # multimodal headstart's frozen-main multi_transform, which
            # load_checkpoint restores via _restore_extra_meta) — warming
            # pre-restore closures would leave stale fns in _step_fns
            start_epoch = self.load_checkpoint()
            print(f"Resumed from checkpoint at epoch {start_epoch}")
        self._prewarm_chain_steps()
        if not resumed:
            self.network.save_network()
            _ = self.optimize_model(do_training=False)
            train_writer.add_scalar("loss", self.train_losses[-1], 0)
            dev_writer.add_scalar("loss", self.dev_losses[-1], 0)
            if self.checkpoints:
                self.network.save_network(epoch=0)
        for key in self.statistics_training:
            self.statistics_training[key] = 0

        from abnet3_tpu.profiling import stage_trace
        for epoch in range(start_epoch, self.num_epochs):
            with stage_trace(f"train-epoch-{epoch}"):
                dev_loss = self.optimize_model(do_training=True)
            train_writer.add_scalar("loss", self.train_losses[-1],
                                    epoch + 1)
            dev_writer.add_scalar("loss", self.dev_losses[-1], epoch + 1)

            if self.best_dev is None or dev_loss < self.best_dev:
                self.best_dev = dev_loss
                self.patience_dev = 0
                print("Saving best model so far, "
                      "epoch {}... ".format(epoch + 1), end="", flush=True)
                if self.checkpoints:
                    self.network.save_network(epoch=epoch + 1)
                self.network.save_network()
                self.save_whoami()
                print("Done.")
                self.best_epoch = epoch
            else:
                self.patience_dev += 1
                if self.patience_dev > self.patience:
                    # persist the stopping epoch's counters too: a later
                    # resume would otherwise restore patience just below
                    # threshold and re-run an epoch this run discarded
                    self.save_checkpoint(epoch)
                    print("early stop: dev loss flat for {} epochs"
                          .format(self.patience))
                    print("training finished")
                    break
            self.save_checkpoint(epoch)
        print("Saving best checkpoint network")
        train_writer.close()
        dev_writer.close()

    def plot_train_erros(self):
        """Train/dev loss curves to PDF (fixes the reference's missing
        matplotlib import, reference trainer.py:175-184)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure()
        x = range(len(self.train_losses))
        plt.plot(x, self.train_losses, "r-")
        plt.plot(x, self.dev_losses, "b+")
        fig.savefig(self.network.output_path + "_plot.pdf",
                    bbox_inches="tight")

    def plot_summary_statistics(self):
        print(" ***** Statistics for the training step ***** ")
        for key, stats in self.statistics_training.items():
            print(" Number of {} pairs seen: {} \t\t".format(key, stats))

    def pretty_print_losses(self, train_loss, dev_loss):
        print("  training loss:\t\t{:.6f}".format(train_loss))
        print("  dev loss:\t\t\t{:.6f}".format(dev_loss))


class TrainerSiamese(TrainerBuilder):
    """Siamese trainer: fused jitted step (reference trainer.py:203-256)."""

    # -- jitted steps -------------------------------------------------------

    def _make_train_step(self):
        network, loss, optimizer = self.network, self.loss, self.optimizer

        @jax.jit
        def step(params, state, opt_state, rng, x1, x2, y, w):
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
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt, value
        return step

    def _make_eval_step(self):
        network, loss = self.network, self.loss

        @jax.jit
        def step(params, state, x1, x2, y, w):
            e1, e2, _ = network.forward(params, state, x1, x2, train=False)
            return loss(e1, e2, y, weights=w)
        return step

    def _pad_batch(self, batch: Batch):
        """Pad rows to a power-of-two bucket so step shapes repeat."""
        n = batch.x1.shape[0]
        bucket = _round_bucket(n)
        if bucket == n:
            w = batch.weights if batch.weights is not None else \
                jnp.ones((n,), jnp.float32)
            return batch._replace(weights=w)
        pad = bucket - n
        d = batch.x1.shape[1]
        zx = jnp.zeros((pad, d), batch.x1.dtype)
        w = batch.weights if batch.weights is not None else \
            jnp.ones((n,), jnp.float32)
        return Batch(
            jnp.concatenate([batch.x1, zx]),
            jnp.concatenate([batch.x2, zx]),
            jnp.concatenate([batch.y, jnp.ones((pad,), batch.y.dtype)]),
            jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)]),
            None if batch.y_spk is None else jnp.concatenate(
                [batch.y_spk, jnp.ones((pad,), batch.y_spk.dtype)]))

    # -- device-bank path ----------------------------------------------------

    _BANK_EXTRA_LABELS = False

    def _bank_mesh(self):
        if self.mesh is not None:
            return self.mesh
        from abnet3_tpu.parallel import make_mesh
        return make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])

    def _ensure_bank_steps(self, bucket=None, steps_per_call=1):
        """Step functions per length bucket (one compile per bucket of the
        coarse ladder; short pair batches run small DTW shapes)."""
        key = ("bank", bucket, steps_per_call)
        if key not in self._step_fns:
            from abnet3_tpu.parallel import make_pair_train_step
            self._step_fns[key] = make_pair_train_step(
                self.network, self.loss, self.optimizer,
                self.dataloader.token_bank, self._bank_mesh(),
                align_different_words=getattr(
                    self.dataloader, "align_different_words", False),
                extra_labels=self._BANK_EXTRA_LABELS,
                max_frames=bucket, matrix_loss=self.matrix_loss,
                steps_per_call=steps_per_call,
                frame_bank=self._tcl_frame_bank(),
                tcl=getattr(self.dataloader, "tcl", 0.0))
        return self._step_fns[key]

    def _tcl_frame_bank(self):
        """The tcl frame bank, only when tcl mixing is actually on — a
        loader may hold a frame bank for other purposes (the pure-tcl
        TemporalCoherenceDataLoader trains from one with tcl == 0)."""
        if getattr(self.dataloader, "tcl", 0.0) > 0:
            return getattr(self.dataloader, "frame_bank", None)
        return None

    def _ensure_split_bank_steps(self, bucket=None, steps_per_call=1):
        key = ("split_bank", bucket, steps_per_call)
        if key not in self._step_fns:
            from abnet3_tpu.parallel import make_split_pair_train_step
            self._step_fns[key] = make_split_pair_train_step(
                self.network, self.loss, self.optimizer,
                self.dataloader.token_bank, self._bank_mesh(),
                align_different_words=getattr(
                    self.dataloader, "align_different_words", False),
                extra_labels=self._BANK_EXTRA_LABELS,
                max_frames=bucket, steps_per_call=steps_per_call,
                frame_bank=self._tcl_frame_bank(),
                tcl=getattr(self.dataloader, "tcl", 0.0),
                matrix_loss=self.matrix_loss)
        return self._step_fns[key]

    @property
    def _bank_steps_per_call(self):
        return max(getattr(self.dataloader, "steps_per_call", 1), 1)

    def _ensure_frame_steps(self, mode, steps_per_call=1):
        """Index-gather steps over the dataloader's device-resident
        frame tables (FrameBankBatch; Frames/Multimodal/TCL loaders)."""
        key = ("frame", mode, steps_per_call)
        if key not in self._step_fns:
            from abnet3_tpu.dataloader import MultimodalDataLoader
            from abnet3_tpu.parallel import make_frame_train_step
            tables = self.dataloader.frame_tables(mode == "train")
            # multimodality comes from the LOADER type, not the table
            # count: a one-modality MultimodalDataLoader still feeds a
            # MultimodalSiameseNetwork, whose forward takes x lists
            multimodal = isinstance(self.dataloader, MultimodalDataLoader)
            self._step_fns[key] = make_frame_train_step(
                self.network, self.loss, self._checkpoint_optimizer(),
                tables, self._bank_mesh(),
                steps_per_call=steps_per_call,
                multimodal=multimodal)
        return self._step_fns[key]

    def _steps_for(self, b, steps_per_call):
        """Train/eval step pair for an index batch (mixed/split bank or
        frame-table)."""
        from abnet3_tpu.dataloader import FrameBankBatch, SplitBankBatch
        if isinstance(b, SplitBankBatch):
            return self._ensure_split_bank_steps(b.bucket, steps_per_call)
        if isinstance(b, FrameBankBatch):
            return self._ensure_frame_steps(b.mode, steps_per_call)
        return self._ensure_bank_steps(b.bucket, steps_per_call)

    def _args_for(self, b):
        from abnet3_tpu.dataloader import FrameBankBatch, SplitBankBatch
        if isinstance(b, SplitBankBatch):
            return self._split_bank_args(b)
        if isinstance(b, FrameBankBatch):
            w = b.weights if b.weights is not None else \
                np.ones(len(np.asarray(b.y)), np.float32)
            return (b.i1, b.i2, b.y, w)
        return self._bank_args(b)

    def _stack_args(self, chunk):
        """Host-stack a chunk of K same-bucket batches into the
        (K, ...) arrays the chained step/eval factories expect."""
        per_batch = [self._args_for(b) for b in chunk]
        return tuple(np.stack([np.asarray(args[i]) for args in per_batch])
                     for i in range(len(per_batch[0])))

    def _pad_chunk(self, chunk):
        """Pad a partial chunk to K with repeats of its last batch;
        returns (padded_chunk, n_real, valid) — valid is None for full
        chunks. The repeated batches run under a zero valid mask in the
        K-chained executable, so leftovers never need a K=1 compile
        variant (each costs a fresh ~30-100 s remote compile)."""
        K = self._bank_steps_per_call
        n = len(chunk)
        if n >= K:
            return chunk, n, None
        valid = np.zeros(K, np.float32)
        valid[:n] = 1.0
        return chunk + [chunk[-1]] * (K - n), n, valid

    def _dispatch_chunk(self, chunk, rng):
        """Dispatch K buffered same-bucket batches as one scanned call
        (partial chunks pad to K under a valid mask)."""
        chunk, _, valid = self._pad_chunk(chunk)
        train_step, _ = self._steps_for(chunk[0], len(chunk))
        params, state, opt, value = train_step(
            self.network.params, self.network.state, self._opt_state,
            rng, *self._stack_args(chunk), valid=valid)
        self.network.params = params
        self.network.state = state
        self._opt_state = opt
        return value

    def _dispatch_eval_chunk(self, chunk):
        """Dispatch K buffered same-bucket dev batches as one scanned
        eval call; returns the mean of the real per-batch losses
        (padded repeats are dropped host-side)."""
        chunk, n, _ = self._pad_chunk(chunk)
        _, eval_step = self._steps_for(chunk[0], len(chunk))
        values = eval_step(self.network.params, self.network.state,
                           *self._stack_args(chunk))
        return jnp.mean(values[:n])

    def _flush_split_buffers(self, rng):
        """Flush partial train buffers at pass end as padded K-chains;
        yields (mean-loss-over-chunk, n_real_batches) pairs."""
        out = []
        chunks = [c for c in self._split_buf.values() if c]
        for j, chunk in enumerate(chunks):
            out.append((self._dispatch_chunk(
                chunk, jax.random.fold_in(rng, j)), len(chunk)))
        self._split_buf = {}
        return out

    def _flush_split_eval_buffers(self):
        """Flush partial eval buffers at pass end as padded K-chains;
        yields (mean-loss-over-chunk, n_real_batches) pairs."""
        out = []
        for chunk in getattr(self, "_split_eval_buf", {}).values():
            if chunk:
                out.append((self._dispatch_eval_chunk(chunk), len(chunk)))
        self._split_eval_buf = {}
        return out

    def _split_bank_args(self, b):
        args = (b.ids1s, b.ids2s, b.ws, b.ids1d, b.ids2d, b.wd)
        if self._BANK_EXTRA_LABELS:
            assert b.y_spk_s is not None, \
                "multitask bank training needs speaker labels"
            args = args + (b.y_spk_s, b.y_spk_d)
        if b.tcl_i1 is not None:
            args = args + (b.tcl_i1, b.tcl_i2, b.tcl_y, b.tcl_w)
        return args

    def _bank_args(self, b):
        if self._BANK_EXTRA_LABELS:
            assert b.y_spk is not None, \
                "multitask bank training needs speaker labels"
            args = (b.ids1, b.ids2, b.y, b.y_spk, b.pair_w)
        else:
            args = (b.ids1, b.ids2, b.y, b.pair_w)
        if b.tcl_i1 is not None:
            args = args + (b.tcl_i1, b.tcl_i2, b.tcl_y, b.tcl_w)
        return args

    def _give_single(self, b, do_training, rng):
        train_step, eval_step = self._steps_for(b, 1)
        if do_training:
            params, state, opt, value = train_step(
                self.network.params, self.network.state, self._opt_state,
                rng, *self._args_for(b))
            self.network.params = params
            self.network.state = state
            self._opt_state = opt
            return value
        return eval_step(self.network.params, self.network.state,
                         *self._args_for(b))

    def _prewarm_chain_steps(self):
        """Compile every (bucket, kind) chained-step executable the
        epoch streams will need on background threads, BEFORE the first
        pass — concurrent remote compiles overlap instead of
        serializing at first-dispatch time (the wav front end's prewarm
        pattern, features.py). Through the tunnel's compile service each
        executable costs 30-100 s; a 2-bucket run compiles 4 of them
        (train+eval per bucket), so the first epoch pays minutes of
        serial compile without this. Outputs are discarded; trainer
        state is untouched. The peek at the batch streams
        snapshots/restores ALL mutable iteration state — the loader
        RNG, the global `random` module state (the pairs/tcl loaders
        draw from it), `batch_position`, the in-place-shuffled
        `frame_pairs` order, and statistics — so epoch-0 batch
        composition is identical with and without prewarm. Keys seen
        only in the dev stream compile only their eval executable
        (training never dispatches on dev batches); train-stream keys
        compile both (the epoch-0 eval pass routes the train iterator
        through the eval step).

        ABNET3_TRAIN_PREWARM: "0" off, "1" force-on, unset = on unless
        the backend is cpu (local compiles are fast; tests stay lean)."""
        import random as pyrandom
        import threading
        from collections import defaultdict
        flag = os.environ.get("ABNET3_TRAIN_PREWARM", "")
        if flag == "0":
            return
        if flag != "1" and jax.default_backend() == "cpu":
            return
        dl = self.dataloader
        if hasattr(dl, "sampler_for") or not hasattr(dl, "batch_iterator"):
            return
        from abnet3_tpu.dataloader import (BankBatch, FrameBankBatch,
                                           SplitBankBatch)
        K = self._bank_steps_per_call
        if hasattr(dl, "load_data"):
            # build lazy state (tables, frame_pairs) BEFORE snapshotting:
            # restoring a pre-build None over built state would leave
            # load_data's cache check satisfied but the data gone
            dl.load_data()
        reps = {}
        modes_seen = {}
        rng_state = dl._rng.get_state() if hasattr(dl, "_rng") else None
        py_state = pyrandom.getstate()
        stats = dict(getattr(dl, "statistics_training", {}) or {})
        pos = getattr(dl, "batch_position", None)
        frame_pairs = getattr(dl, "frame_pairs", None)
        fp_snap = None
        if isinstance(frame_pairs, dict):
            # FramesDataLoader shuffles these arrays IN PLACE per epoch;
            # restoring the RNG alone would leave the extra shuffle
            # behind (shuffle-of-shuffle != shuffle), changing every
            # later epoch's batch composition vs a no-prewarm run
            fp_snap = {m: (v.copy() if hasattr(v, "copy") else v)
                       for m, v in frame_pairs.items()}
        try:
            for train_mode in (True, False):
                for seen, b in enumerate(
                        dl.batch_iterator(train_mode=train_mode)):
                    if not isinstance(b, (BankBatch, FrameBankBatch,
                                          SplitBankBatch)):
                        # padded/host stream: fused step, nothing to
                        # chain HERE — but keep keys collected from the
                        # other stream (e.g. tcl: chained train batches
                        # + padded dev word-pair batches)
                        break
                    key = (type(b).__name__, getattr(b, "bucket", None),
                           getattr(b, "mode", None))
                    chunk = reps.setdefault(key, [])
                    modes_seen.setdefault(key, set()).add(train_mode)
                    if len(chunk) < K:
                        chunk.append(b)
                    if seen >= 256:  # bucket census, not a full epoch
                        break
        finally:
            if rng_state is not None:
                dl._rng.set_state(rng_state)
            pyrandom.setstate(py_state)
            if hasattr(dl, "statistics_training"):
                dl.statistics_training = defaultdict(int, stats)
            if pos is not None:
                dl.batch_position = pos
            if fp_snap is not None:
                dl.frame_pairs = fp_snap
        if not reps:
            return
        params, state = self.network.params, self.network.state
        if self._opt_state is None:
            self._opt_state = self._checkpoint_optimizer().init(params)
        opt_state = self._opt_state
        rng = jax.random.PRNGKey(self.seed)

        def run(fn, fargs, fkw):
            try:
                jax.block_until_ready(fn(*fargs, **fkw))
            except Exception:
                pass  # the real dispatch surfaces any error

        threads = []
        for key, chunk in reps.items():
            chunk, _, valid = self._pad_chunk(list(chunk))
            train_fn, eval_fn = self._steps_for(chunk[0], len(chunk))
            # dev-only keys (e.g. FrameBankBatch mode='dev') never see a
            # train dispatch — compiling one would waste a 30-100 s
            # remote compile and stall the th.join() below on it
            want_train = True in modes_seen.get(key, {True})
            if K > 1:
                args = self._stack_args(chunk)
                jobs = [(eval_fn, (params, state) + args, {})]
                if want_train:
                    jobs.append((train_fn,
                                 (params, state, opt_state, rng) + args,
                                 {"valid": valid}))
            else:
                args = tuple(self._args_for(chunk[0]))
                jobs = [(eval_fn, (params, state) + args, {})]
                if want_train:
                    jobs.append((train_fn,
                                 (params, state, opt_state, rng) + args,
                                 {}))
            for job in jobs:
                th = threading.Thread(target=run, args=job, daemon=True)
                th.start()
                threads.append(th)
        for th in threads:
            th.join()

    def _give_buffered_batch(self, b, do_training, rng):
        """Bank batches (mixed or split) accumulate into per-(kind,
        bucket) buffers of K and get dispatched as one scanned call
        (returns None while buffering) — train AND eval passes both
        amortize the per-dispatch latency; partial buffers flush at
        pass end as padded K-chains under a valid mask (_pad_chunk), so
        no single-step executable variant ever compiles."""
        K = self._bank_steps_per_call
        if K == 1:
            return self._give_single(b, do_training, rng)
        attr = "_split_buf" if do_training else "_split_eval_buf"
        bufs = getattr(self, attr, None)
        if bufs is None:
            bufs = {}
            setattr(self, attr, bufs)
        key = (type(b).__name__, getattr(b, "bucket", None),
               getattr(b, "mode", None))
        buf = bufs.setdefault(key, [])
        buf.append(b)
        if len(buf) >= K:
            bufs[key] = []
            # (mean-of-K, K): the epoch average weights the chunk by K
            if do_training:
                return (self._dispatch_chunk(buf, rng), len(buf))
            return (self._dispatch_eval_chunk(buf), len(buf))
        return None

    def give_batch_to_network(self, batch, do_training, rng):
        """One step; returns the batch loss value
        (reference trainer.py:211-224)."""
        from abnet3_tpu.dataloader import (BankBatch, FrameBankBatch,
                                           SplitBankBatch)
        if isinstance(batch, (BankBatch, FrameBankBatch, SplitBankBatch)):
            if rng is None:
                rng = jax.random.PRNGKey(self.seed)
            return self._give_buffered_batch(batch, do_training, rng)
        b = self._pad_batch(batch)
        if do_training:
            if "train" not in self._step_fns:
                self._step_fns["train"] = self._make_train_step()
            step = self._step_fns["train"]
            params, state, opt, value = step(
                self.network.params, self.network.state, self._opt_state,
                rng, b.x1, b.x2, b.y, b.weights)
            self.network.params = params
            self.network.state = state
            self._opt_state = opt
            return value
        if "eval" not in self._step_fns:
            self._step_fns["eval"] = self._make_eval_step()
        return self._step_fns["eval"](
            self.network.params, self.network.state, b.x1, b.x2, b.y,
            b.weights)

    # -- fully on-device sampling path ---------------------------------------

    def _ensure_sampled_steps(self, train_mode):
        key = ("sampled", train_mode)
        if key not in self._step_fns:
            from abnet3_tpu.parallel import (make_mesh,
                                             make_sampled_eval_step,
                                             make_sampled_train_step)
            mesh = self.mesh
            if mesh is None:
                mesh = make_mesh(n_data=1, n_model=1,
                                 devices=jax.devices()[:1])
            bank = self.dataloader.bank_for(train_mode)
            sampler = self.dataloader.sampler_for(train_mode)
            k = getattr(self.dataloader, "steps_per_call", 1)
            self._step_fns[key] = (
                make_sampled_train_step(self.network, self.loss,
                                        self.optimizer, bank, sampler,
                                        mesh, steps_per_call=k,
                                        matrix_loss=self.matrix_loss,
                                        extra_labels=
                                        self._BANK_EXTRA_LABELS),
                make_sampled_eval_step(self.network, self.loss, bank,
                                       sampler, mesh,
                                       matrix_loss=self.matrix_loss,
                                       steps_per_call=k,
                                       extra_labels=
                                       self._BANK_EXTRA_LABELS))
        return self._step_fns[key]

    def _optimize_model_sampled(self, do_training):
        """Epoch driven purely by PRNG keys: sampling + alignment + train
        all happen inside the jitted step (OnDeviceSamplerDataLoader)."""
        epoch_idx = len(self.train_losses)
        base_rng = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                      epoch_idx)
        train_step, _ = self._ensure_sampled_steps(True)
        _, dev_eval = self._ensure_sampled_steps(False)

        k = getattr(self.dataloader, "steps_per_call", 1)
        assert k >= 1, "steps_per_call must be >= 1"
        n_steps = self.dataloader.steps_per_epoch(True)
        n_calls = max(round(n_steps / k), 1)
        if n_calls * k != n_steps and not getattr(
                self, "_warned_steps", False):
            print(f"steps_per_call={k} does not divide "
                  f"num_max_minibatches={n_steps}; running "
                  f"{n_calls * k} steps per epoch")
            self._warned_steps = True
        losses = []
        for i in range(n_calls):
            rng = jax.random.fold_in(base_rng, i)
            if do_training:
                # train_step returns the mean over its K chained batches
                params, state, opt, value = train_step(
                    self.network.params, self.network.state,
                    self._opt_state, rng)
                self.network.params = params
                self.network.state = state
                self._opt_state = opt
            else:
                # eval steps return the (K,) per-batch losses
                train_eval = self._ensure_sampled_steps(True)[1]
                value = train_eval(self.network.params,
                                   self.network.state, rng)
            losses.append(np.atleast_1d(np.asarray(value)))
        train_loss = float(np.sum([v.mean() for v in losses]))
        n_train = len(losses)

        # dev pass: K-chained eval dispatches, like the train pass (one
        # eval per dispatch made the dev pass dominate small epochs
        # through a high-latency link)
        losses = []
        n_dev_calls = max(round(self.dataloader.steps_per_epoch(False)
                                / k), 1)
        for i in range(n_dev_calls):
            rng = jax.random.fold_in(base_rng, 10_000 + i)
            losses.append(np.atleast_1d(np.asarray(dev_eval(
                self.network.params, self.network.state, rng))))
        dev_loss = float(np.sum([v.sum() for v in losses]))
        n_dev = sum(v.size for v in losses)

        self.train_losses.append(train_loss / max(n_train, 1))
        self.dev_losses.append(dev_loss / max(n_dev, 1))
        self.pretty_print_losses(self.train_losses[-1],
                                 self.dev_losses[-1])
        # per-batch mean: checkpoint-stable across dev-batch-count changes
        # (same early-stop decisions as the reference's sum when the dev
        # set is fixed, reference trainer.py:131-142)
        return self.dev_losses[-1]

    # -- epoch ---------------------------------------------------------------

    def optimize_model(self, do_training=True):
        """One train pass + one dev pass (reference trainer.py:226-256)."""
        params, state = self.network.ensure_init(self.seed)
        if self._opt_state is None:
            # subclasses with wrapped optimizers (MultimodalTrainer's
            # multi_transform) supply the matching structure here
            self._opt_state = self._checkpoint_optimizer().init(params)
        if hasattr(self.dataloader, "sampler_for"):
            return self._optimize_model_sampled(do_training)
        epoch_idx = len(self.train_losses)
        base_rng = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                      epoch_idx)

        train_loss, num_batches_train = 0.0, 0
        losses = []
        for i, batch in enumerate(prefetch_iterator(
                self.dataloader.batch_iterator(train_mode=True),
                self.prefetch)):
            rng = jax.random.fold_in(base_rng, i)
            value = self.give_batch_to_network(batch, do_training, rng)
            if value is None:  # buffered into a chained dispatch
                continue
            if isinstance(value, tuple):  # (mean over k batches, k)
                value, count = value
            else:
                count = 1
            losses.append((value, count))
            num_batches_train += count
        # flush partial chained buffers (epoch-0 eval passes route the
        # train iterator through the eval buffers)
        if do_training and getattr(self, "_split_buf", None):
            flush_rng = jax.random.fold_in(base_rng, 1 << 20)
            for value, count in self._flush_split_buffers(flush_rng):
                losses.append((value, count))
                num_batches_train += count
        if getattr(self, "_split_eval_buf", None):
            for value, count in self._flush_split_eval_buffers():
                losses.append((value, count))
                num_batches_train += count
        train_loss = float(np.sum(
            [np.asarray(v) * c for v, c in losses])) if losses else 0.0

        dev_loss, num_batches_dev = 0.0, 0
        losses = []
        for batch in prefetch_iterator(
                self.dataloader.batch_iterator(train_mode=False),
                self.prefetch):
            value = self.give_batch_to_network(batch, False, None)
            if value is None:  # buffered into a chained eval dispatch
                continue
            if isinstance(value, tuple):  # (mean over k batches, k)
                value, count = value
            else:
                count = 1
            losses.append((value, count))
            num_batches_dev += count
        if getattr(self, "_split_eval_buf", None):
            for value, count in self._flush_split_eval_buffers():
                losses.append((value, count))
                num_batches_dev += count
        dev_loss = float(np.sum([np.asarray(v) * c for v, c in losses])) \
            if losses else 0.0

        self.train_losses.append(train_loss / max(num_batches_train, 1))
        self.dev_losses.append(dev_loss / max(num_batches_dev, 1))
        self.pretty_print_losses(self.train_losses[-1], self.dev_losses[-1])
        self.statistics_training = dict(
            getattr(self.dataloader, "statistics_training", {}))
        # per-batch mean (see _optimize_model_sampled)
        return self.dev_losses[-1]


class TrainerSiameseMultitask(TrainerSiamese):
    """Multitask trainer: weighted spk+phn loss
    (reference trainer.py:259-279)."""

    def _make_train_step(self):
        network, loss, optimizer = self.network, self.loss, self.optimizer

        @jax.jit
        def step(params, state, opt_state, rng, x1, x2, y_spk, y_phn, w):
            def loss_fn(p):
                spk1, phn1, spk2, phn2, new_state = network.forward(
                    p, state, x1, x2, rng=rng, train=True, weights=w)
                return loss(spk1, phn1, spk2, phn2, y_spk, y_phn,
                            weights=w), new_state
            (value, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = opt_update(optimizer, grads, opt_state,
                                          params, value,
                                          lambda q: loss_fn(q)[0])
            return (optax.apply_updates(params, updates), new_state,
                    new_opt, value)
        return step

    def _make_eval_step(self):
        network, loss = self.network, self.loss

        @jax.jit
        def step(params, state, x1, x2, y_spk, y_phn, w):
            spk1, phn1, spk2, phn2, _ = network.forward(
                params, state, x1, x2, train=False)
            return loss(spk1, phn1, spk2, phn2, y_spk, y_phn, weights=w)
        return step

    _BANK_EXTRA_LABELS = True

    def give_batch_to_network(self, batch, do_training, rng):
        from abnet3_tpu.dataloader import BankBatch, SplitBankBatch
        if isinstance(batch, (BankBatch, SplitBankBatch)):
            if rng is None:
                rng = jax.random.PRNGKey(self.seed)
            return self._give_buffered_batch(batch, do_training, rng)
        b = self._pad_batch(batch)
        assert b.y_spk is not None, \
            "multitask training needs speaker labels (MultiTaskDataLoader)"
        if do_training:
            if "train" not in self._step_fns:
                self._step_fns["train"] = self._make_train_step()
            params, state, opt, value = self._step_fns["train"](
                self.network.params, self.network.state, self._opt_state,
                rng, b.x1, b.x2, b.y_spk, b.y, b.weights)
            self.network.params = params
            self.network.state = state
            self._opt_state = opt
            return value
        if "eval" not in self._step_fns:
            self._step_fns["eval"] = self._make_eval_step()
        return self._step_fns["eval"](
            self.network.params, self.network.state, b.x1, b.x2, b.y_spk,
            b.y, b.weights)


class MultimodalTrainer(TrainerSiamese):
    """Multimodal trainer with the attention headstart schedule
    (reference trainer.py:281-365)."""

    def __init__(self, headstart=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if headstart:
            self.headstart_epochs = headstart[0]
            self.parallel_after_headstart = headstart[1]
            try:
                self.network.integration_unit.set_headstart_weight(
                    headstart[2])
            except NotImplementedError:
                raise TypeError(
                    "Headstart only works with integration units which "
                    "have set_headstart_weight() implemented")
            self.headstart = True
        else:
            self.headstart = False

    def _build_effective_optimizer(self):
        """Optimizer over the multimodal param groups: separate attention
        LR (reference model.py:512-528) and, after a non-parallel
        headstart ends, frozen main-network updates (the reference's
        network.freeze_training(), reference trainer.py:348-350)."""
        attention_lr = getattr(self.network, "attention_lr", None)
        frozen_main = getattr(self, "_frozen_main", False)
        if not attention_lr and not frozen_main:
            return self.optimizer
        main_tx = optax.set_to_zero() if frozen_main else self.optimizer
        att_tx = (build_optimizer(self.optimizer_type, attention_lr,
                                  self.momentum)
                  if attention_lr else self.optimizer)
        label_fn = jax.tree_util.Partial(
            lambda params: {k: ("attention" if k == "integration"
                                else "main") for k in params})
        return optax.multi_transform(
            {"main": main_tx, "attention": att_tx}, label_fn)

    def _checkpoint_optimizer(self):
        return self._build_effective_optimizer()

    def _extra_ckpt_meta(self):
        meta = {"frozen_main": getattr(self, "_frozen_main", False)}
        if self.headstart:
            meta["headstart_epochs"] = self.headstart_epochs
        return meta

    def _restore_extra_meta(self, meta):
        self._frozen_main = bool(meta.get("frozen_main", False))
        if self.headstart and "headstart_epochs" in meta:
            self.headstart_epochs = int(meta["headstart_epochs"])

    def _make_train_step(self):
        network, loss = self.network, self.loss
        tx = self._build_effective_optimizer()
        self._effective_optimizer = tx

        @jax.jit
        def step(params, state, opt_state, rng, x1_list, x2_list, y, w):
            def loss_fn(p):
                # weights: padded weight-0 rows stay out of BN stats
                e1, e2, new_state = network.forward(p, state, x1_list,
                                                    x2_list, rng=rng,
                                                    train=True,
                                                    weights=w)
                return loss(e1, e2, y, weights=w), new_state
            (value, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = opt_update(tx, grads, opt_state, params,
                                          value, lambda q: loss_fn(q)[0])
            return (optax.apply_updates(params, updates), new_state,
                    new_opt, value)
        return step

    def _make_eval_step(self):
        network, loss = self.network, self.loss

        @jax.jit
        def step(params, state, x1_list, x2_list, y, w):
            e1, e2, _ = network.forward(params, state, x1_list, x2_list,
                                        train=False)
            return loss(e1, e2, y, weights=w)
        return step

    def give_batch_to_network(self, batch, do_training, rng):
        from abnet3_tpu.dataloader import FrameBankBatch
        if isinstance(batch, FrameBankBatch):
            # device path: per-modality tables live in HBM, the step
            # gathers by index (make_frame_train_step multimodal=True)
            if rng is None:
                rng = jax.random.PRNGKey(self.seed)
            return self._give_buffered_batch(batch, do_training, rng)
        # multimodal frame batches are dense (no padding weights)
        w = batch.weights if batch.weights is not None else \
            jnp.ones((batch.y.shape[0],), jnp.float32)
        x1 = tuple(batch.x1) if isinstance(batch.x1, list) else batch.x1
        x2 = tuple(batch.x2) if isinstance(batch.x2, list) else batch.x2
        if do_training:
            if "train" not in self._step_fns:
                # optimizer state is initialised (or restored) by
                # optimize_model/load_checkpoint with the matching
                # _checkpoint_optimizer structure
                self._step_fns["train"] = self._make_train_step()
            params, state, opt, value = self._step_fns["train"](
                self.network.params, self.network.state, self._opt_state,
                rng, x1, x2, batch.y, w)
            self.network.params = params
            self.network.state = state
            self._opt_state = opt
            return value
        if "eval" not in self._step_fns:
            self._step_fns["eval"] = self._make_eval_step()
        return self._step_fns["eval"](
            self.network.params, self.network.state, x1, x2, batch.y, w)

    def optimize_model(self, do_training=True):
        if self.headstart and self.headstart_epochs == 0:
            if not self.parallel_after_headstart:
                # freeze everything except the attention unit: the train
                # step is rebuilt with zeroed main-group updates
                # (optimizer state re-initialises for the new structure)
                self._frozen_main = True
            try:
                self.network.integration_unit.start_training()
            except NotImplementedError:
                raise TypeError(
                    "Headstart only works with integration units which "
                    "have start_training() implemented")
            # unit un-froze / groups changed: recompile + fresh opt state
            self._step_fns.pop("train", None)
            self._step_fns.pop("eval", None)
            for key in [k for k in self._step_fns
                        if isinstance(k, tuple) and k[0] == "frame"]:
                self._step_fns.pop(key)
            self._opt_state = None
            print("Headstart ended")
        dev_loss = super().optimize_model(do_training)
        if self.headstart and self.headstart_epochs > -1:
            self.headstart_epochs -= 1
        return dev_loss
