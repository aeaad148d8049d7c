"""Dataloaders: token-pair files + h5features -> device-ready frame batches.

The reference builds every minibatch serially on the host: slice token
features, run Cython DTW per same-pair, vstack, shuffle, then push to the
GPU (reference dataloader.py:166-312). That interleaved CPU work is its
throughput bottleneck. Here batch construction is split TPU-first:

- the host only slices token features and pads them into bucketed
  ``(B, T, d)`` arrays (pure memcpy work, overlapped with device compute via
  :func:`prefetch_iterator`);
- alignment (DTW for same pairs, truncate/diagonal for diff pairs), frame
  gathering and masking all run on device inside one jitted computation
  (:mod:`abnet3_tpu.ops.dtw`), so a yielded batch is already a set of
  device arrays with a padding-weight vector the losses consume directly.

Every loader also keeps a ``align_backend='host'`` parity path that
reproduces the reference's exact numpy semantics (used in tests).

Loader zoo parity (reference dataloader.py):
- OriginalDataLoader (:43), PairsDataLoader (:355),
  TemporalCoherenceDataLoader (:549), FramesDataLoader (:580),
  MultiTaskDataLoader (:742), MultimodalDataLoader (:794).
"""

from __future__ import annotations

import os
import queue as queue_mod
import random
import threading
from collections import defaultdict
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from abnet3_tpu.ops.dtw import (align_diff_batch, dtw_align_batch,
                                gather_aligned)
from abnet3_tpu.utils import (Features_Accessor, get_dtw_alignment,
                              group_pairs, read_dataset, read_feats,
                              read_spkid_file)

__all__ = ["Batch", "BankBatch", "SplitBankBatch", "FrameBankBatch",
           "DataLoader", "OriginalDataLoader",
           "PairsDataLoader", "TemporalCoherenceDataLoader",
           "FramesDataLoader", "MultiTaskDataLoader",
           "MultimodalDataLoader", "OnDeviceSamplerDataLoader",
           "prefetch_iterator"]


class Batch(NamedTuple):
    """One training batch of aligned frame pairs.

    ``weights`` is None on the host parity path (all frames valid);
    ``y_spk`` is set only by the multitask loader. ``x1``/``x2`` are lists
    for the multimodal loader, arrays otherwise.
    """
    x1: object
    x2: object
    y: object
    weights: object = None
    y_spk: object = None


class BankBatch(NamedTuple):
    """An index-only batch against a device-resident TokenBank: the step
    streams just token ids + per-pair labels/weights (a few hundred
    bytes), all feature work happens on device. The tcl_* fields carry a
    static temporal-coherence frame-index group when tcl > 0 (same
    contract as SplitBankBatch)."""
    ids1: object
    ids2: object
    y: object
    pair_w: object
    y_spk: object = None
    bucket: object = None  # static length bucket (max token frames)
    tcl_i1: object = None
    tcl_i2: object = None
    tcl_y: object = None
    tcl_w: object = None


class SplitBankBatch(NamedTuple):
    """Bank index batch with a STATIC same/diff split: the fused step runs
    the DTW DP only on the same-word group and the cheap truncate/diagonal
    alignment on the diff group (a mixed batch pays the quadratic DP for
    every pair). Group sizes are fixed per dataloader (ragged tails carry
    weight 0)."""
    ids1s: object
    ids2s: object
    ws: object     # (Bs,) same-pair validity weights
    ids1d: object
    ids2d: object
    wd: object     # (Bd,) diff-pair validity weights
    y_spk_s: object = None
    y_spk_d: object = None
    bucket: object = None
    # temporal-coherence group (bank backend, tcl > 0): global frame-index
    # pairs into the dataloader's frame_bank + labels/weights. The step
    # rescales tcl_w so the loss mixes exactly the tcl fraction
    # (reference dataloader.py:314-352 appends host frame pairs instead).
    tcl_i1: object = None
    tcl_i2: object = None
    tcl_y: object = None
    tcl_w: object = None


class FrameBankBatch(NamedTuple):
    """Index-only frame batch against device-resident frame table(s)
    (dataloader.frame_tables): the step gathers X1 = table[i1],
    X2 = table[i2] inside the jitted computation; the host streams only
    int32 row indices — no per-batch feature h2d (the round-2 Frames /
    Multimodal / TemporalCoherence loaders shipped the features
    themselves with every batch). ``mode`` selects the train/dev table;
    padded rows carry weight 0."""
    i1: object
    i2: object
    y: object
    weights: object = None
    mode: str = "train"


def prefetch_iterator(iterator, size: int = 2):
    """Run `iterator` in a background thread, keeping `size` batches ready
    (replaces the reference's serial batch-build/step interleaving).

    The worker's puts poll a stop flag so an abandoned consumer (e.g. a
    step raising mid-epoch closes this generator) unblocks the thread
    instead of leaving it parked forever on a full queue, pinning up to
    `size` batches and the source iterator across retries."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    sentinel = object()
    err: List[BaseException] = []
    stop = threading.Event()

    def q_put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not q_put(item):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q_put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        t.join(timeout=5)


from abnet3_tpu.utils import pow2_bucket as _bucket  # noqa: E402


def _pad_tokens(feats: Sequence[np.ndarray], T: int) -> Tuple[np.ndarray,
                                                              np.ndarray]:
    d = feats[0].shape[1]
    out = np.zeros((len(feats), T, d), np.float32)
    lens = np.zeros((len(feats),), np.int32)
    for i, f in enumerate(feats):
        n = min(len(f), T)
        out[i, :n] = f[:n]
        lens[i] = n
    return out, lens


class DataLoader:
    """Base interface (reference dataloader.py:29-40)."""

    def batch_iterator(self, train_mode=True):
        raise NotImplementedError(
            "You must implement batch_iterator in DataLoader class.")

    #: constructor-arg name -> callable(self) for the few args whose
    #: values are not stored under the same attribute name
    _WHOAMI_ALIASES: dict = {}

    def whoami(self):
        """Reproducibility dump: EVERY non-private constructor argument
        across the MRO, read back from the instance (the reference's
        whoami idiom dumps the full configuration, reference
        dataloader.py:60-84; an arg a subclass forgets to store fails
        loudly here instead of silently vanishing from the dump)."""
        import inspect
        params = {}
        for cls in type(self).__mro__:
            init = cls.__dict__.get("__init__")
            if init is None:
                continue
            for name, p in inspect.signature(init).parameters.items():
                if name == "self" or p.kind in (p.VAR_POSITIONAL,
                                                p.VAR_KEYWORD):
                    continue
                if name in params:
                    continue  # nearest-subclass value wins
                alias = self._WHOAMI_ALIASES.get(name)
                params[name] = (alias(self) if alias is not None
                                else getattr(self, name))
        return {"params": params,
                "class_name": self.__class__.__name__}


class OriginalDataLoader(DataLoader):
    """Pair files -> DTW-aligned frame-pair batches
    (reference dataloader.py:43-352)."""

    TCL_DISTANCE_SAME = [1]
    TCL_DISTANCES_DIFF = [15, 20, 25, 30]

    def __init__(self, pairs_path, features_path, num_max_minibatches=1000,
                 seed=None, batch_size=8, shuffle_between_epochs=False,
                 align_different_words=False, tcl=0.0,
                 align_backend="device", bank_split=True,
                 steps_per_call=8):
        assert 0 <= tcl < 1
        # 'device': per-batch padded arrays aligned on device
        # 'bank'  : whole token corpus resident in HBM, index-only batches
        # 'host'  : reference-exact numpy path (parity tests)
        assert align_backend in ("device", "bank", "host")
        self.pairs_path = pairs_path
        self.features_path = features_path
        self.statistics_training = defaultdict(int)
        self.seed = seed
        self.num_max_minibatches = num_max_minibatches
        self.batch_size = batch_size
        self.features: Optional[Features_Accessor] = None
        self.shuffle_between_epochs = shuffle_between_epochs
        self.align_different_words = align_different_words
        self.tcl = tcl
        self.align_backend = align_backend
        # static same/diff grouping for bank batches: the fused step runs
        # the DTW DP only on the same-word group
        self.bank_split = bank_split
        # train steps chained per jitted dispatch (amortizes dispatch
        # latency; the trainer buffers same-bucket batches to this depth)
        self.steps_per_call = steps_per_call
        self.train_files = None
        self.pairs = {"train": None, "dev": None}
        self.token_bank = None
        self._bank_pairs = None
        self.frame_bank = None  # (N_frames, d) device frame corpus (tcl)
        self._tcl_files = None
        self._rng = np.random.RandomState(seed)

    # pickle support: drop the multi-GB features / device arrays from the
    # state and reload them on restore (reference dataloader.py:86-117).
    # Works for every subclass: heavy lazily-loaded caches are nulled to
    # their initial sentinels and load_data() rebuilds them.
    _HEAVY_ATTRS = ("features", "token_bank", "_bank_pairs",
                    "frame_bank",
                    "features_dict", "device_samplers", "_banks")
    _HEAVY_MODE_DICTS = ("token_features", "frame_pairs", "token_tables",
                         "_tables_dev")

    def __getstate__(self):
        d = dict(self.__dict__)
        for k in self._HEAVY_ATTRS:
            if k in d:
                d[k] = None
        for k in self._HEAVY_MODE_DICTS:
            if k in d:
                d[k] = {mode: None for mode in d[k]}
        d["statistics_training"] = dict(self.statistics_training)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self.statistics_training = defaultdict(
            int, d.get("statistics_training", {}))
        self.load_data()

    # -- data ------------------------------------------------------------

    def load_data(self):
        """Load features + pair lists once (reference dataloader.py:125-145).
        """
        if self.features is None:
            print("Loading features")
            features, _, _ = read_feats(self.features_path)
            self.features = features
        if self.pairs["train"] is None:
            print("Loading word pairs")
            self.pairs["train"] = read_dataset(
                os.path.join(self.pairs_path, "train_pairs/dataset"))
        if self.pairs["dev"] is None:
            self.pairs["dev"] = read_dataset(
                os.path.join(self.pairs_path, "dev_pairs/dataset"))
        # sorted: set iteration order varies with string-hash
        # randomization across processes; frame_bank layout and tcl file
        # draws index into this list, so an unsorted order would defeat
        # fixed-seed reproducibility run-to-run
        self.train_files = sorted(
            {p[0] for p in self.pairs["train"]}
            | {p[3] for p in self.pairs["train"]})
        if self.align_backend == "bank" and self.token_bank is None:
            self._build_token_bank()
        if (self.align_backend == "bank" and self.tcl > 0
                and getattr(self, "frame_bank", None) is None):
            # getattr: checkpoints pickled before tcl-on-bank existed
            # restore without the attribute
            self._build_frame_bank()

    def _build_token_bank(self, fid2spk=None):
        """Upload every unique token of both splits into one HBM-resident
        TokenBank and precompute per-split (id1, id2, y[, y_spk]) arrays."""
        from abnet3_tpu.ops.bank import TokenBank
        all_pairs = {m: group_pairs(self.pairs[m]) for m in
                     ("train", "dev")}
        token_feats = {}
        for m in ("train", "dev"):
            token_feats.update(self.get_token_feats(all_pairs[m]))
        # drop zero-length tokens (degenerate slices the reference skips)
        token_feats = {k: v for k, v in token_feats.items() if len(v) > 0}
        print("Uploading %d tokens to the device token bank"
              % len(token_feats))
        self.token_bank = TokenBank(token_feats)
        self._bank_pairs = {}
        for m in ("train", "dev"):
            ids1, ids2, ys, yspk = [], [], [], []
            for f1, s1, e1, f2, s2, e2, ptype in self.pairs[m]:
                k1, k2 = (f1, s1, e1), (f2, s2, e2)
                if k1 not in self.token_bank.key_to_id or \
                        k2 not in self.token_bank.key_to_id:
                    continue
                ids1.append(self.token_bank.key_to_id[k1])
                ids2.append(self.token_bank.key_to_id[k2])
                ys.append(1.0 if ptype == "same" else -1.0)
                if fid2spk is not None:
                    yspk.append(1.0 if fid2spk[f1] == fid2spk[f2]
                                else -1.0)
            ids1 = np.asarray(ids1, np.int32)
            ids2 = np.asarray(ids2, np.int32)
            ys = np.asarray(ys, np.float32)
            yspk = (np.asarray(yspk, np.float32) if fid2spk is not None
                    else None)
            # length-sorted order: batches of similar-length pairs run
            # small static DTW shapes (quadratic savings)
            lens = self.token_bank.lengths_host
            pair_len = np.maximum(lens[ids1], lens[ids2])
            order = np.argsort(pair_len, kind="stable")
            # per-pair length buckets are epoch-invariant: precompute
            # once (vectorized over the coarse power-of-two ladder).
            # max_len joins the probe set: tokens longer than the last
            # power-of-two probe would searchsorted past the ladder end
            ladder = np.asarray(sorted({self.token_bank.bucket_for(b)
                                        for b in (1, 16, 32, 64, 128,
                                                  256, 512, 1024, 2048,
                                                  4096,
                                                  self.token_bank
                                                  .max_len)}))
            buckets = ladder[np.searchsorted(ladder,
                                             pair_len[order])]
            self._bank_pairs[m] = (
                ids1[order], ids2[order], ys[order],
                yspk[order] if yspk is not None else None, buckets)

    def _epoch_bank_pairs(self, mode):
        """Pairs for one epoch: length-sorted, and (with
        shuffle_between_epochs) re-shuffled WITHIN equal-bucket groups so
        batch composition varies across epochs while batches still hold
        similar-length pairs — same compile variants, fresh mixes (the
        device/host backends honor the flag via _select_batches)."""
        ids1, ids2, ys, yspk, buckets = self._bank_pairs[mode]
        if not self.shuffle_between_epochs or len(ids1) == 0:
            return ids1, ids2, ys, yspk
        order = np.arange(len(ids1))
        for b in np.unique(buckets):
            grp = np.flatnonzero(buckets == b)
            order[grp] = self._rng.permutation(order[grp])
        return (ids1[order], ids2[order], ys[order],
                yspk[order] if yspk is not None else None)

    def bank_batch_iterator(self, train_mode=True):
        """Yield fixed-size BankBatch index batches (an 'epoch' samples
        num_max_minibatches batches, like batch_iterator)."""
        self.load_data()
        mode = "train" if train_mode else "dev"
        ids1, ids2, ys, yspk = self._epoch_bank_pairs(mode)
        num_pairs = len(ids1)
        if num_pairs == 0:  # empty split: no batches (like device/host)
            return
        if self.bank_split:
            yield from self._split_bank_batches(ids1, ids2, ys, yspk,
                                                count_stats=train_mode)
            return
        bs = self.batch_size
        num_batches = (num_pairs + bs - 1) // bs
        if self.num_max_minibatches < num_batches:
            selected = self._rng.choice(num_batches,
                                        self.num_max_minibatches,
                                        replace=False)
        else:
            selected = self._rng.permutation(num_batches)
        lens = self.token_bank.lengths_host
        for b in selected:
            sl = slice(b * bs, (b + 1) * bs)
            bi1, bi2, by = ids1[sl], ids2[sl], ys[sl]
            bspk = yspk[sl] if yspk is not None else None
            n = len(bi1)
            bucket = self.token_bank.bucket_for(
                int(np.maximum(lens[bi1], lens[bi2]).max()))
            w = np.ones(bs, np.float32)
            if n < bs:  # pad the ragged tail; padded pairs weigh 0
                pad = bs - n
                bi1 = np.concatenate([bi1, np.zeros(pad, np.int32)])
                bi2 = np.concatenate([bi2, np.zeros(pad, np.int32)])
                by = np.concatenate([by, np.ones(pad, np.float32)])
                if bspk is not None:
                    bspk = np.concatenate([bspk,
                                           np.ones(pad, np.float32)])
                w[n:] = 0.0
            if train_mode:
                self.statistics_training["SameType"] += int(
                    ((by > 0) & (w > 0)).sum())
                self.statistics_training["DiffType"] += int(
                    ((by < 0) & (w > 0)).sum())
            tcl_fields = {}
            # gate on tcl, not just frame_bank: TemporalCoherenceDataLoader
            # builds a frame bank for its own train batches while tcl==0,
            # and its dev pass routes through this iterator
            if self.tcl > 0 and getattr(self, "frame_bank", None) \
                    is not None:
                ti1, ti2, ty, tw = self._sample_tcl_group()
                tcl_fields = dict(tcl_i1=ti1, tcl_i2=ti2,
                                  tcl_y=ty, tcl_w=tw)
            # K>1: numpy on purpose — the trainer host-stacks K
            # same-bucket batches into one chained dispatch (one h2d per
            # stacked field amortizes over K). K=1: stage on device from
            # the (prefetch) thread so the ~100ms-RPC h2d overlaps the
            # previous step's compute instead of serializing with it.
            stage = ((lambda a: a) if self.steps_per_call > 1
                     else jnp.asarray)
            yield BankBatch(stage(bi1.astype(np.int32)),
                            stage(bi2.astype(np.int32)),
                            stage(by), stage(w),
                            None if bspk is None else stage(bspk),
                            bucket=bucket,
                            **{k: stage(v)
                               for k, v in tcl_fields.items()})

    def get_token_feats(self, pairs, frames=False):
        """Slice unique token features (reference dataloader.py:147-164)."""
        token_feats = {}
        get_features = (self.features.get_between_frames if frames
                        else self.features.get)
        for group in ("same", "diff"):
            for f1, s1, e1, f2, s2, e2 in pairs[group]:
                if (f1, s1, e1) not in token_feats:
                    token_feats[f1, s1, e1] = get_features(f1, s1, e1)
                if (f2, s2, e2) not in token_feats:
                    token_feats[f2, s2, e2] = get_features(f2, s2, e2)
        return token_feats

    # -- device batch construction ----------------------------------------

    def _collect_pair_feats(self, pairs, token_feats, group):
        """Valid pairs of (feat1, feat2); drops degenerate tokens the
        reference skips (reference dataloader.py:184-190)."""
        out = []
        meta = []
        for f1, s1, e1, f2, s2, e2 in pairs[group]:
            if (s1 > e1) or (s2 > e2):
                continue
            feat1 = token_feats[f1, s1, e1]
            feat2 = token_feats[f2, s2, e2]
            if len(feat1) == 0 or len(feat2) == 0:
                continue
            out.append((feat1, feat2))
            meta.append((f1, f2))
        return out, meta

    def load_frames_from_pairs_device(self, pairs, fid2spk=None):
        """Device-aligned batch: (X1, X2, y, weights[, y_spk]) padded
        arrays. The functional replacement for the reference's host loop
        (reference dataloader.py:166-261)."""
        token_feats = self.get_token_feats(pairs)
        return self._assemble_device(pairs, token_feats, fid2spk)

    def _assemble_device(self, pairs, token_feats, fid2spk=None):
        same, same_meta = self._collect_pair_feats(pairs, token_feats,
                                                   "same")
        diff, diff_meta = self._collect_pair_feats(pairs, token_feats,
                                                   "diff")
        segs_x1, segs_x2, segs_y, segs_w, segs_yspk = [], [], [], [], []

        def run_group(group, meta, is_same):
            T1 = _bucket(max(len(a) for a, _ in group))
            T2 = _bucket(max(len(b) for _, b in group))
            f1, n1 = _pad_tokens([a for a, _ in group], T1)
            f2, n2 = _pad_tokens([b for _, b in group], T2)
            if is_same:
                p1, p2, plen = dtw_align_batch(
                    jnp.asarray(f1), jnp.asarray(f2),
                    jnp.asarray(n1), jnp.asarray(n2))
            else:
                p1, p2, plen = align_diff_batch(
                    jnp.asarray(n1), jnp.asarray(n2), T1, T2,
                    align_different_words=self.align_different_words)
            x1 = gather_aligned(jnp.asarray(f1), p1)   # (B, L, d)
            x2 = gather_aligned(jnp.asarray(f2), p2)
            L = x1.shape[1]
            mask = (jnp.arange(L)[None, :]
                    < plen[:, None]).astype(jnp.float32)
            d = x1.shape[-1]
            segs_x1.append(x1.reshape(-1, d))
            segs_x2.append(x2.reshape(-1, d))
            segs_y.append(jnp.full((x1.shape[0] * L,),
                                   1.0 if is_same else -1.0))
            segs_w.append(mask.reshape(-1))
            key = "SameType" if is_same else "DiffType"
            self.statistics_training[key] += len(group)
            if fid2spk is not None:
                spk_same = np.asarray(
                    [1.0 if fid2spk[a] == fid2spk[b] else -1.0
                     for a, b in meta], np.float32)
                segs_yspk.append(jnp.repeat(jnp.asarray(spk_same), L))
                for a, b in meta:
                    tag = "SameSpk" if fid2spk[a] == fid2spk[b] \
                        else "DiffSpk"
                    self.statistics_training[key + tag] += 1

        if same:
            run_group(same, same_meta, True)
        if diff:
            run_group(diff, diff_meta, False)
        if not segs_x1:
            return None
        x1 = jnp.concatenate(segs_x1, axis=0)
        x2 = jnp.concatenate(segs_x2, axis=0)
        y = jnp.concatenate(segs_y, axis=0)
        w = jnp.concatenate(segs_w, axis=0)
        y_spk = (jnp.concatenate(segs_yspk, axis=0)
                 if fid2spk is not None else None)
        return Batch(x1, x2, y, w, y_spk=y_spk)

    # -- host (parity) batch construction ---------------------------------

    def load_frames_from_pairs(self, pairs, seed=0, fid2spk=None,
                               frames=False):
        """Reference-exact host batch construction
        (reference dataloader.py:166-261)."""
        token_feats = self.get_token_feats(pairs, frames=frames)
        X1, X2, y_phn, y_spk = [], [], [], []
        for f1, s1, e1, f2, s2, e2 in pairs["same"]:
            if (s1 > e1) or (s2 > e2):
                continue
            feat1 = token_feats[f1, s1, e1]
            feat2 = token_feats[f2, s2, e2]
            try:
                path1, path2 = get_dtw_alignment(feat1, feat2)
            except Exception:
                continue
            self.statistics_training["SameType"] += 1
            if fid2spk:
                same_spk = fid2spk[f1] == fid2spk[f2]
                y_spk.append((1.0 if same_spk else -1.0)
                             * np.ones(len(path1)))
                self.statistics_training[
                    "SameTypeSameSpk" if same_spk
                    else "SameTypeDiffSpk"] += 1
            X1.append(feat1[path1, :])
            X2.append(feat2[path2, :])
            y_phn.append(np.ones(len(path1)))

        for f1, s1, e1, f2, s2, e2 in pairs["diff"]:
            if (s1 > e1) or (s2 > e2):
                continue
            feat1 = token_feats[f1, s1, e1]
            feat2 = token_feats[f2, s2, e2]
            n1, n2 = feat1.shape[0], feat2.shape[0]
            if self.align_different_words:
                min_word, max_word = sorted((feat1, feat2), key=len)
                mapping = np.rint(np.linspace(
                    0, len(min_word) - 1, num=len(max_word))).astype(int)
                word1, word2 = max_word, min_word[mapping, :]
            else:
                word1 = feat1[:min(n1, n2), :]
                word2 = feat2[:min(n1, n2), :]
            X1.append(word1)
            X2.append(word2)
            y_phn.append(-1 * np.ones(len(word1)))
            self.statistics_training["DiffType"] += 1
            if fid2spk:
                same_spk = fid2spk[f1] == fid2spk[f2]
                y_spk.append((1.0 if same_spk else -1.0)
                             * np.ones(len(word1)))
                self.statistics_training[
                    "DiffTypeSameSpk" if same_spk
                    else "DiffTypeDiffSpk"] += 1

        X1, X2 = np.vstack(X1), np.vstack(X2)
        y_phn = np.concatenate(y_phn)
        rng = np.random.RandomState(seed)
        ind = rng.permutation(len(y_phn))
        X1, X2, y_phn = X1[ind, :], X2[ind, :], y_phn[ind]
        if fid2spk:
            return X1, X2, np.concatenate(y_spk)[ind], y_phn
        return X1, X2, y_phn

    # -- iteration ----------------------------------------------------------

    def _select_batches(self, pairs):
        num_pairs = len(pairs)
        if self.shuffle_between_epochs:
            self._rng.shuffle(pairs)
        sliced = range(0, num_pairs, self.batch_size)
        batches = [pairs[i:i + self.batch_size] for i in sliced]
        if self.num_max_minibatches < len(batches):
            selected = self._rng.choice(len(batches),
                                        self.num_max_minibatches,
                                        replace=False)
        else:
            print("Number of batches not sufficient,"
                  " iterating over all the batches")
            selected = self._rng.permutation(len(batches))
        return batches, selected

    def batch_iterator(self, train_mode=True):
        """Yield Batch tuples for one epoch (an 'epoch' samples
        num_max_minibatches random pair batches, reference
        dataloader.py:263-312)."""
        self.load_data()
        if self.align_backend == "bank":
            yield from self.bank_batch_iterator(train_mode)
            return
        mode = "train" if train_mode else "dev"
        batches, selected = self._select_batches(list(self.pairs[mode]))
        for batch_id in selected:
            grouped = group_pairs(batches[batch_id])
            if self.align_backend == "device":
                batch = self.load_frames_from_pairs_device(grouped)
                if batch is None:
                    continue
                if self.tcl > 0:
                    batch = self._add_tcl(batch)
                yield batch
            else:
                X1, X2, y = self.load_frames_from_pairs(grouped)
                if self.tcl > 0:
                    X1, X2, y = self.add_tcl_to_batch((X1, X2, y))
                yield Batch(jnp.asarray(X1), jnp.asarray(X2),
                            jnp.asarray(y))

    # -- temporal coherence loss pairs --------------------------------------

    def temporal_coherence_loss(self, num_pairs):
        """Close-frame positives (dt=1) and far negatives (dt in
        {15,20,25,30}) sampled from train files
        (reference dataloader.py:324-352)."""
        X1, X2, Y = [], [], []
        per_iter = (len(self.TCL_DISTANCES_DIFF)
                    + len(self.TCL_DISTANCE_SAME))
        files = list(self.features.features.keys())
        if self.train_files is not None:
            files = self.train_files
        max_delta = max(self.TCL_DISTANCES_DIFF)
        for _ in range(round(num_pairs / per_iter)):
            f = random.choice(files)
            file_features = self.features.features[
                self.features._key(f)]
            if len(file_features) <= max_delta:
                continue
            t = random.randrange(len(file_features) - max_delta)
            for delta in self.TCL_DISTANCE_SAME:
                X1.append(file_features[t])
                X2.append(file_features[t + delta])
                Y.append(1)
            for delta in self.TCL_DISTANCES_DIFF:
                X1.append(file_features[t])
                X2.append(file_features[t + delta])
                Y.append(-1)
        if not X1:
            return (np.zeros((0, 1), np.float32),) * 2 + (np.zeros(0),)
        return np.vstack(X1), np.vstack(X2), np.array(Y, np.float32)

    def add_tcl_to_batch(self, batch):
        """Mix tcl fraction of coherence pairs into a host batch
        (reference dataloader.py:314-322)."""
        X1, X2, Y = batch
        num_pairs = len(Y)
        num_to_add = int((self.tcl * num_pairs) / (1 - self.tcl))
        X1_t, X2_t, Y_t = self.temporal_coherence_loss(num_to_add)
        return (np.vstack((X1, X1_t)), np.vstack((X2, X2_t)),
                np.concatenate((Y, Y_t)))

    def _add_tcl(self, batch: Batch) -> Batch:
        n_valid = float(np.asarray(jnp.sum(batch.weights))) \
            if batch.weights is not None else len(batch.y)
        num_to_add = int((self.tcl * n_valid) / (1 - self.tcl))
        X1_t, X2_t, Y_t = self.temporal_coherence_loss(num_to_add)
        if len(Y_t) == 0:
            return batch
        w_t = np.ones(len(Y_t), np.float32)
        w = batch.weights if batch.weights is not None \
            else jnp.ones((len(batch.y),), jnp.float32)
        return Batch(
            jnp.concatenate([batch.x1, jnp.asarray(X1_t)], axis=0),
            jnp.concatenate([batch.x2, jnp.asarray(X2_t)], axis=0),
            jnp.concatenate([batch.y, jnp.asarray(Y_t)], axis=0),
            jnp.concatenate([w, jnp.asarray(w_t)], axis=0),
            batch.y_spk)


    def _build_frame_bank(self):
        """Device-resident frame corpus for temporal-coherence sampling:
        one (N_frames, d) array of the train files' frames. TCL pairs then
        travel as int32 index pairs and are gathered inside the jitted
        step (the reference ships the frames themselves with each batch,
        reference dataloader.py:324-352)."""
        files = self.train_files or []
        max_delta = max(self.TCL_DISTANCES_DIFF)
        chunks, self._tcl_files = [], []
        offset = 0
        for f in files:
            feat = self.features.features.get(self.features._key(f))
            if feat is None:
                continue
            if len(feat) > max_delta:
                # anchors stay >= max_delta from the end (reference
                # dataloader.py:337)
                self._tcl_files.append((offset, len(feat) - max_delta))
            chunks.append(np.asarray(feat, np.float32))
            offset += len(feat)
        if not self._tcl_files:
            print("Warning: tcl=%g is a no-op — no train file is longer "
                  "than %d frames" % (self.tcl, max_delta))
            self.frame_bank = None
            return
        from abnet3_tpu.ops.bank import upload_rows
        self.frame_bank = upload_rows(np.concatenate(chunks, axis=0))
        # static tcl group size per batch: per-anchor yield is
        # 1 same + len(TCL_DISTANCES_DIFF) diff pairs; the anchor count
        # approximates tcl/(1-tcl) of the batch's expected frame pairs
        # (the step rescales weights to the exact fraction). Pure-tcl
        # loaders (TemporalCoherenceDataLoader) have no token bank and
        # size their groups from batch_size directly.
        if self.token_bank is not None and self.tcl > 0:
            per_iter = (len(self.TCL_DISTANCE_SAME)
                        + len(self.TCL_DISTANCES_DIFF))
            mean_len = float(self.token_bank.lengths_host.mean())
            approx_frames = self.batch_size * 1.25 * mean_len
            self._tcl_anchors = max(1, round(
                self.tcl / (1.0 - self.tcl) * approx_frames / per_iter))
        else:
            self._tcl_anchors = None

    def _sample_tcl_group(self, n_anchors=None):
        """One static-size tcl index group: close positives (dt=1), far
        negatives (dt in {15,20,25,30}), anchors uniform over files then
        over time (reference dataloader.py:333-352)."""
        files = self._tcl_files
        if n_anchors is None:
            n_anchors = self._tcl_anchors
        i1, i2, y = [], [], []
        for fi in self._rng.randint(len(files), size=n_anchors):
            off, max_t = files[fi]
            a = off + self._rng.randint(max_t)
            for dt in self.TCL_DISTANCE_SAME:
                i1.append(a); i2.append(a + dt); y.append(1.0)
            for dt in self.TCL_DISTANCES_DIFF:
                i1.append(a); i2.append(a + dt); y.append(-1.0)
        return (np.asarray(i1, np.int32), np.asarray(i2, np.int32),
                np.asarray(y, np.float32),
                np.ones(len(y), np.float32))

    def _split_bank_batches(self, ids1, ids2, ys, yspk,
                            count_stats=True):
        """Yield SplitBankBatch index batches with static per-group sizes:
        Bs same + Bd diff pairs per batch (proportional to the split's
        global same/diff ratio; ragged tails weigh 0)."""
        same = ys > 0
        s1, s2 = ids1[same], ids2[same]
        d1, d2 = ids1[~same], ids2[~same]
        spk_s = yspk[same] if yspk is not None else None
        spk_d = yspk[~same] if yspk is not None else None
        n_s, n_d = len(s1), len(d1)
        bs = self.batch_size
        Bs = max(1, round(bs * n_s / max(n_s + n_d, 1))) if n_s else 1
        Bd = max(bs - Bs, 1) if n_d else 1
        num_batches = max(
            (n_s + Bs - 1) // Bs if n_s else 0,
            (n_d + Bd - 1) // Bd if n_d else 0, 1)
        if self.num_max_minibatches < num_batches:
            selected = self._rng.choice(num_batches,
                                        self.num_max_minibatches,
                                        replace=False)
        else:
            selected = self._rng.permutation(num_batches)
        lens = self.token_bank.lengths_host

        def take(arr, b, B, fill=0):
            sl = arr[b * B:(b + 1) * B]
            w = np.ones(B, np.float32)
            if len(sl) < B:
                w[len(sl):] = 0.0
                sl = np.concatenate(
                    [sl, np.full(B - len(sl), fill, arr.dtype)])
            return sl, w

        for b in selected:
            bi1s, ws = take(s1, b, Bs)
            bi2s, _ = take(s2, b, Bs)
            bi1d, wd = take(d1, b, Bd)
            bi2d, _ = take(d2, b, Bd)
            if not n_s:
                ws[:] = 0.0
            if not n_d:
                wd[:] = 0.0
            maxlen = 1
            if ws.any():
                maxlen = max(maxlen, int(np.maximum(
                    lens[bi1s], lens[bi2s])[ws > 0].max()))
            if wd.any():
                maxlen = max(maxlen, int(np.maximum(
                    lens[bi1d], lens[bi2d])[wd > 0].max()))
            bucket = self.token_bank.bucket_for(maxlen)
            bspk_s = bspk_d = None
            if yspk is not None:
                bspk_s, _ = take(spk_s, b, Bs, fill=1.0)
                bspk_d, _ = take(spk_d, b, Bd, fill=1.0)
            if count_stats:  # train pairs only (dev passes don't count)
                self.statistics_training["SameType"] += int(ws.sum())
                self.statistics_training["DiffType"] += int(wd.sum())
            # numpy on purpose: the trainer host-stacks K batches into one
            # chained dispatch (stacking device arrays costs extra device
            # ops; one h2d per stacked field amortizes over K steps)
            tcl_fields = {}
            # tcl gate, not frame_bank alone (see bank_batch_iterator)
            if self.tcl > 0 and getattr(self, "frame_bank", None) \
                    is not None:
                ti1, ti2, ty, tw = self._sample_tcl_group()
                tcl_fields = dict(tcl_i1=ti1, tcl_i2=ti2,
                                  tcl_y=ty, tcl_w=tw)
            yield SplitBankBatch(bi1s, bi2s, ws, bi1d, bi2d, wd,
                                 bspk_s, bspk_d, bucket=bucket,
                                 **tcl_fields)


class PairsDataLoader(OriginalDataLoader):
    """Numeric-frame KNN pair files (reference dataloader.py:355-546)."""

    SPLIT_FILES = "files"
    SPLIT_EACH_FILE = "split_each_file"
    SPLIT_METHODS = [SPLIT_FILES, SPLIT_EACH_FILE]

    # iteration counts live in the self.iterations dict
    _WHOAMI_ALIASES = {
        "train_iterations": lambda s: s.iterations["train"],
        "test_iterations": lambda s: s.iterations["test"],
    }

    def __init__(self, pairs_path, features_path, id_to_file,
                 ratio_split_train_test=0.7, batch_size=8,
                 train_iterations=10000, test_iterations=500,
                 proportion_positive_pairs=0.5,
                 align_different_words=True,
                 split_method=SPLIT_EACH_FILE,
                 align_backend="device"):
        super().__init__(pairs_path, features_path, batch_size=batch_size,
                         align_different_words=align_different_words,
                         align_backend=align_backend)
        self.id_to_file = id_to_file
        self.pairs = {"train": None, "test": None}
        self.ratio_split_train_test = ratio_split_train_test
        self.iterations = {"train": train_iterations,
                           "test": test_iterations}
        self.proportion_positive_pairs = proportion_positive_pairs
        self.split_method = split_method
        assert split_method in self.SPLIT_METHODS
        self.tokens = {"train": [], "test": []}
        self.files = set()
        self.seed = 0

    def load_data(self):
        if self.pairs["train"] is None:
            self.load_pairs()
        if self.features is None:
            print("Loading features")
            features, _, _ = read_feats(self.features_path)
            self.features = features
        if self.align_backend == "bank" and self.token_bank is None:
            from abnet3_tpu.ops.bank import TokenBank
            token_feats = {}
            for mode in ("train", "test"):
                for key in self.tokens[mode]:
                    f, b, e = key
                    feat = self.features.get_between_frames(f, b, e)
                    if len(feat) > 0:
                        token_feats[key] = feat
            print("Uploading %d tokens to the device token bank"
                  % len(token_feats))
            self.token_bank = TokenBank(token_feats)

    def load_pairs(self):
        """Parse ``f1 f2 b1 e1 b2 e2 dist`` integer-frame pair lines with
        optional id->filename mapping (reference dataloader.py:430-462)."""
        pairs = []
        file_mapping = {}
        if self.id_to_file is not None:
            with open(self.id_to_file, "r") as f:
                for line in f:
                    i, name = line.strip().split()
                    file_mapping[int(i)] = name
        with open(self.pairs_path, "r") as f:
            for line in f:
                file1, file2, b1, e1, b2, e2, _dist = line.split(" ")
                file1 = file_mapping.get(int(file1), int(file1))
                file2 = file_mapping.get(int(file2), int(file2))
                self.files.add(file1)
                self.files.add(file2)
                pairs.append([file1, int(b1), int(e1),
                              file2, int(b2), int(e2)])
        if self.split_method == self.SPLIT_FILES:
            self.pairs["train"], self.pairs["test"] = \
                self.split_train_test(pairs)
        else:
            self.pairs["train"], self.pairs["test"] = \
                self.split_train_test_each_file(pairs)
        for mode in ("train", "test"):
            toks = set()
            for f1, b1, e1, f2, b2, e2 in self.pairs[mode]:
                toks.add((f1, b1, e1))
                toks.add((f2, b2, e2))
            self.tokens[mode] = sorted(toks, key=str)

    def split_train_test(self, pairs):
        """File-level split; cross pairs dropped
        (reference dataloader.py:464-481)."""
        num_test = int(len(self.files) * (1 - self.ratio_split_train_test))
        dev_files = set(random.sample(sorted(self.files, key=str),
                                      num_test))
        print("Dev-split files: %s" % dev_files)
        train_pairs, dev_pairs = [], []
        for pair in pairs:
            f1, _, _, f2, _, _ = pair
            if f1 in dev_files and f2 in dev_files:
                dev_pairs.append(pair)
            elif f1 not in dev_files and f2 not in dev_files:
                train_pairs.append(pair)
        return train_pairs, dev_pairs

    def split_train_test_each_file(self, pairs):
        """Time split within each file (reference dataloader.py:483-505)."""
        len_files = defaultdict(int)
        for f1, b1, e1, f2, b2, e2 in pairs:
            len_files[f1] = max(len_files[f1], e1)
            len_files[f2] = max(len_files[f2], e2)
        thr = {f: l * self.ratio_split_train_test
               for f, l in len_files.items()}
        train_pairs, dev_pairs = [], []
        for p in pairs:
            f1, b1, e1, f2, b2, e2 = p
            if b1 > thr[f1] and b2 > thr[f2]:
                dev_pairs.append(p)
            elif b1 < thr[f1] and b2 <= thr[f2]:
                train_pairs.append(p)
        return train_pairs, dev_pairs

    def batch_iterator(self, train_mode=True):
        """Sample positive pairs + wrongly-aligned same-token negatives
        (reference dataloader.py:507-546)."""
        print("building pair batches")
        mode = "train" if train_mode else "test"
        self.load_data()
        iterations = self.iterations[mode]
        all_positive = self.pairs[mode]
        tokens = self.tokens[mode]

        num_pairs = iterations * self.batch_size
        num_pos = int(num_pairs * self.proportion_positive_pairs)
        if num_pos > len(all_positive):
            print("positive-pair budget capped: requested {} but the "
                  "corpus only has {}".format(num_pos, len(all_positive)))
            num_pos = len(all_positive)
        num_neg = num_pairs - num_pos
        positive = [p + ["same"]
                    for p in random.sample(all_positive, num_pos)]
        toks = random.choices(tokens, k=2 * num_neg)
        negative = [list(toks[i]) + list(toks[i + 1]) + ["diff"]
                    for i in range(0, len(toks), 2)]
        pairs = positive + negative
        random.shuffle(pairs)
        print("pair batches ready for this epoch")
        for i in range(iterations):
            chunk = pairs[i * self.batch_size:(i + 1) * self.batch_size]
            if not chunk:
                break
            if self.align_backend == "bank":
                batch = self._bank_batch_from_pairs(chunk)
                if batch is not None:
                    yield batch
                continue
            grouped = group_pairs([tuple(p) for p in chunk])
            if self.align_backend == "device":
                token_feats = self.get_token_feats(grouped, frames=True)
                batch = self._assemble_device(grouped, token_feats)
                if batch is not None:
                    yield batch
            else:
                X1, X2, y = self.load_frames_from_pairs(grouped,
                                                        frames=True)
                yield Batch(jnp.asarray(X1), jnp.asarray(X2),
                            jnp.asarray(y))

    def _bank_batch_from_pairs(self, chunk):
        """Convert sampled (f1,b1,e1,f2,b2,e2,type) pairs into a
        fixed-shape BankBatch of token ids."""
        kid = self.token_bank.key_to_id
        ids1, ids2, ys = [], [], []
        for f1, b1, e1, f2, b2, e2, ptype in (tuple(p) for p in chunk):
            k1, k2 = (f1, b1, e1), (f2, b2, e2)
            if k1 not in kid or k2 not in kid:
                continue
            ids1.append(kid[k1])
            ids2.append(kid[k2])
            ys.append(1.0 if ptype == "same" else -1.0)
        if not ids1:
            return None
        bs = self.batch_size
        n = len(ids1)
        w = np.ones(bs, np.float32)
        pad = bs - n
        if pad:
            ids1 += [0] * pad
            ids2 += [0] * pad
            ys += [1.0] * pad
            w[n:] = 0.0
        lens = self.token_bank.lengths_host
        i1 = np.asarray(ids1, np.int32)
        i2 = np.asarray(ids2, np.int32)
        bucket = self.token_bank.bucket_for(
            int(np.maximum(lens[i1[:n]], lens[i2[:n]]).max()))
        return BankBatch(i1, i2, np.asarray(ys, np.float32), w,
                         bucket=bucket)


class TemporalCoherenceDataLoader(OriginalDataLoader):
    """Trains purely on temporal-coherence pairs; dev uses sampled pairs
    (reference dataloader.py:549-577)."""

    def __init__(self, pairs_path, features_path, batch_size=500,
                 test_words_batch_size=8, num_max_minibatches=1000,
                 align_backend="device", steps_per_call=8):
        super().__init__(pairs_path, features_path,
                         num_max_minibatches=num_max_minibatches,
                         batch_size=test_words_batch_size,
                         align_backend=align_backend,
                         steps_per_call=steps_per_call)
        self.test_words_batch_size = test_words_batch_size
        self.batch_size = batch_size

    def frame_tables(self, train_mode=True):
        """The tcl frame bank is the (single) frame table: train batches
        are index groups into it (dev uses word-pair batches)."""
        self.load_data()
        if self.frame_bank is None:
            self._build_frame_bank()
        return (self.frame_bank,)

    def batch_iterator(self, train_mode=True):
        self.load_data()
        if train_mode and self.align_backend != "host":
            # device path: frames live in the HBM bank; each batch is a
            # static tcl index group (the host path re-ships the frame
            # features themselves per batch)
            if self.frame_bank is None:
                self._build_frame_bank()
            if self.frame_bank is not None:
                per_iter = (len(self.TCL_DISTANCE_SAME)
                            + len(self.TCL_DISTANCES_DIFF))
                anchors = max(1, round(self.batch_size / per_iter))
                for _ in range(self.num_max_minibatches):
                    i1, i2, y, w = self._sample_tcl_group(anchors)
                    yield FrameBankBatch(i1, i2, y, w, mode="train")
                return
            # no train file is long enough for tcl pairs: fall through
        if train_mode:
            for _ in range(self.num_max_minibatches):
                X1, X2, Y = self.temporal_coherence_loss(
                    num_pairs=self.batch_size)
                if len(Y) == 0:
                    continue
                yield Batch(jnp.asarray(X1), jnp.asarray(X2),
                            jnp.asarray(Y))
        else:
            # dev evaluation falls back to the word-pair batches; restore
            # the word batch size for the parent iterator
            saved = self.batch_size
            self.batch_size = self.test_words_batch_size
            try:
                yield from super().batch_iterator(train_mode)
            finally:
                self.batch_size = saved


class FramesDataLoader(OriginalDataLoader):
    """Epoch-level frame shuffling: align *all* pairs once (on device, in
    bucketed mega-batches), store frame-index pairs into one concatenated
    feature table, then yield fixed-size frame batches — every batch is
    two gathers with fully static shapes (reference dataloader.py:580-739
    built the same frame list with per-pair host DTW)."""

    def __init__(self, pairs_path, features_path, batch_size=100,
                 randomize_dataset=True, max_batches_per_epoch=None,
                 align_backend="device", align_chunk=256,
                 steps_per_call=8):
        super().__init__(pairs_path, features_path,
                         align_backend=align_backend,
                         steps_per_call=steps_per_call)
        self.randomize_dataset = randomize_dataset
        self.batch_size = batch_size
        self.max_batches_per_epoch = max_batches_per_epoch
        self.align_chunk = align_chunk
        self.token_features = {"train": None, "dev": None}
        self.frame_pairs = {"train": None, "dev": None}
        self._tables_dev = {"train": None, "dev": None}
        if self.max_batches_per_epoch is not None:
            self.batch_position = 0

    def load_data(self):
        super().load_data()
        for mode in ("train", "dev"):
            if self.token_features[mode] is None:
                print(f"Loading all frames ({mode})..", end="", flush=True)
                self.token_features[mode], self.frame_pairs[mode] = \
                    self.load_all_frames(self.pairs[mode])
                print(" Done. %s frame pairs in total."
                      % len(self.frame_pairs[mode]))

    def _token_table(self, pairs):
        """Concatenate unique token features into one (N, d) table with a
        token -> row-offset index."""
        grouped = group_pairs(pairs)
        token_feats = self.get_token_feats(grouped)
        keys = list(token_feats.keys())
        offsets = {}
        mats = []
        pos = 0
        for k in keys:
            f = token_feats[k]
            offsets[k] = pos
            pos += len(f)
            mats.append(f)
        table = np.vstack(mats).astype(np.float32) if mats else \
            np.zeros((0, 1), np.float32)
        return grouped, token_feats, offsets, table

    def load_all_frames(self, pairs):
        """Return (feature table, frame-index pair array).

        frame pairs: int array (P, 3) of (row1, row2, label)."""
        grouped, token_feats, offsets, table = self._token_table(pairs)
        idx1, idx2, labels = [], [], []

        same, _ = self._collect_pair_feats(grouped, token_feats, "same")
        same_keys = [
            ((f1, s1, e1), (f2, s2, e2))
            for f1, s1, e1, f2, s2, e2 in grouped["same"]
            if not (s1 > e1 or s2 > e2)
            and len(token_feats[f1, s1, e1]) > 0
            and len(token_feats[f2, s2, e2]) > 0]
        # device DTW in chunks of align_chunk pairs
        for c0 in range(0, len(same), self.align_chunk):
            chunk = same[c0:c0 + self.align_chunk]
            kchunk = same_keys[c0:c0 + self.align_chunk]
            T1 = _bucket(max(len(a) for a, _ in chunk))
            T2 = _bucket(max(len(b) for _, b in chunk))
            f1p, n1 = _pad_tokens([a for a, _ in chunk], T1)
            f2p, n2 = _pad_tokens([b for _, b in chunk], T2)
            p1, p2, plen = dtw_align_batch(
                jnp.asarray(f1p), jnp.asarray(f2p),
                jnp.asarray(n1), jnp.asarray(n2))
            p1, p2, plen = map(np.asarray, (p1, p2, plen))
            for b, (k1, k2) in enumerate(kchunk):
                L = int(plen[b])
                idx1.append(offsets[k1] + p1[b, :L])
                idx2.append(offsets[k2] + p2[b, :L])
                labels.append(np.ones(L, np.int32))
                self.statistics_training["SameType"] += 1

        for f1, s1, e1, f2, s2, e2 in grouped["diff"]:
            if (s1 > e1) or (s2 > e2):
                continue
            n1 = len(token_feats[f1, s1, e1])
            n2 = len(token_feats[f2, s2, e2])
            n = min(n1, n2)
            if n == 0:
                continue
            idx1.append(offsets[f1, s1, e1] + np.arange(n))
            idx2.append(offsets[f2, s2, e2] + np.arange(n))
            labels.append(-np.ones(n, np.int32))
            self.statistics_training["DiffType"] += 1

        if idx1:
            frames = np.stack([np.concatenate(idx1),
                               np.concatenate(idx2),
                               np.concatenate(labels)], axis=1)
        else:
            frames = np.zeros((0, 3), np.int64)
        self._rng.shuffle(frames)
        return table, frames

    def _epoch_batch_ids(self, mode, num_batches):
        if mode == "dev" or self.max_batches_per_epoch is None:
            if self.randomize_dataset:
                self._rng.shuffle(self.frame_pairs[mode])
            return range(num_batches)
        if self.batch_position >= num_batches:
            print("Arrived at the end of the dataset. Starting over.")
            if self.randomize_dataset:
                self._rng.shuffle(self.frame_pairs[mode])
            self.batch_position = 0
        ids = range(self.batch_position,
                    min(self.batch_position + self.max_batches_per_epoch,
                        num_batches))
        self.batch_position += self.max_batches_per_epoch
        return ids

    def frame_tables(self, train_mode=True):
        """Device-resident frame table(s) for this mode, uploaded once
        (consumed by parallel.make_frame_train_step)."""
        self.load_data()
        mode = "train" if train_mode else "dev"
        if self._tables_dev.get(mode) is None:
            from abnet3_tpu.ops.bank import upload_rows
            self._tables_dev[mode] = (
                upload_rows(np.asarray(self.token_features[mode])),)
        return self._tables_dev[mode]

    def _index_batches(self, mode):
        """Yield fixed-shape FrameBankBatch index batches (ragged tails
        pad with weight 0 so every epoch compiles one step variant)."""
        frames = self.frame_pairs[mode]
        bs = self.batch_size
        num_batches = max(len(frames) // bs, 1)
        for i in self._epoch_batch_ids(mode, num_batches):
            chunk = frames[i * bs:(i + 1) * bs]
            n = len(chunk)
            if n == 0:
                continue
            w = np.ones(bs, np.float32)
            if n < bs:
                w[n:] = 0.0
                chunk = np.vstack([chunk, np.zeros((bs - n, 3),
                                                   chunk.dtype)])
            yield FrameBankBatch(chunk[:, 0].astype(np.int32),
                                 chunk[:, 1].astype(np.int32),
                                 chunk[:, 2].astype(np.float32), w,
                                 mode=mode)

    def batch_iterator(self, train_mode=True):
        self.load_data()
        mode = "train" if train_mode else "dev"
        if self.align_backend != "host":
            # device path: the table lives in HBM, batches are indices
            self.frame_tables(train_mode)
            yield from self._index_batches(mode)
            return
        frames = self.frame_pairs[mode]
        table = self.token_features[mode]
        num_batches = max(len(frames) // self.batch_size, 1)
        for i in self._epoch_batch_ids(mode, num_batches):
            chunk = frames[i * self.batch_size:(i + 1) * self.batch_size]
            if len(chunk) == 0:
                continue
            X1 = table[chunk[:, 0]]
            X2 = table[chunk[:, 1]]
            y = chunk[:, 2].astype(np.float32)
            yield Batch(jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(y))


class OnDeviceSamplerDataLoader(OriginalDataLoader):
    """Fully on-device data pipeline: no pair files at all.

    Instead of consuming the sampler's text pair files, this loader runs
    the cluster analysis itself (SamplerCluster), splits train/dev,
    uploads every token to a TokenBank and compiles the P(type, speaker)
    distributions into :class:`~abnet3_tpu.ops.sampling.DevicePairSampler`
    tables — training steps then sample fresh pairs *inside* the jitted
    step (see parallel.make_sampled_train_step); the host streams nothing
    but PRNG keys. Pair with DummySampler in the gridsearch YAML.
    """

    def __init__(self, features_path, std_file=None, spkid_file=None,
                 batch_size=64, num_max_minibatches=1000,
                 ratio_train_dev=0.7, ratio_same_diff_spk=0.5,
                 ratio_same_diff_type=0.5, type_sampling_mode="log",
                 spk_sampling_mode="log", max_size_cluster=10,
                 max_num_clusters=None, split_method="clusters",
                 seed=0, pairs_path=None, steps_per_call=8):
        # pairs_path accepted (and ignored) for gridsearch auto-wiring
        super().__init__(pairs_path, features_path,
                         num_max_minibatches=num_max_minibatches,
                         seed=seed, batch_size=batch_size,
                         align_backend="bank")
        self.std_file = std_file
        self.spkid_file = spkid_file
        self.ratio_train_dev = ratio_train_dev
        self.ratio_same_diff_spk = ratio_same_diff_spk
        self.ratio_same_diff_type = ratio_same_diff_type
        self.type_sampling_mode = str(type_sampling_mode)
        self.spk_sampling_mode = str(spk_sampling_mode)
        self.max_size_cluster = max_size_cluster
        self.max_num_clusters = max_num_clusters
        self.split_method = split_method
        # optimizer steps chained per jitted dispatch (amortizes
        # per-dispatch latency; see make_sampled_train_step)
        self.steps_per_call = steps_per_call
        self.device_samplers = None  # {'train': ..., 'dev': ...}

    def load_data(self):
        if self.device_samplers is not None:
            return
        from abnet3_tpu.ops.bank import TokenBank
        from abnet3_tpu.ops.sampling import DevicePairSampler
        from abnet3_tpu.sampler import SamplerClusterSiamese

        print("Loading features")
        self.features, _, _ = read_feats(self.features_path)

        sampler = SamplerClusterSiamese(
            std_file=self.std_file, spkid_file=self.spkid_file,
            ratio_train_dev=self.ratio_train_dev,
            max_size_cluster=self.max_size_cluster,
            split_method=self.split_method, seed=self.seed)
        spkid = read_spkid_file(self.spkid_file)
        sampler.spkid_from_file = spkid
        clusters = sampler.parse_input_file(self.std_file,
                                            self.max_num_clusters)
        if self.split_method == "clusters":
            train_c, dev_c = sampler.split_clusters_ratio(clusters)
        elif self.split_method == "files":
            train_c, dev_c = sampler.split_clusters_on_file(clusters)
        else:
            train_c, dev_c = sampler.split_each_file(clusters)

        self.device_samplers = {}
        self._banks = {}
        for mode, cs in (("train", train_c), ("dev", dev_c)):
            descr = sampler.analyze_clusters(cs, spkid)
            proba = sampler.type_speaker_sampling_p(
                descr, type_sampling_mode=self.type_sampling_mode,
                spk_sampling_mode=self.spk_sampling_mode)
            token_feats = {}
            for tid, (fid, t0, t1) in enumerate(descr["tokens"]):
                f = self.features.get(fid, t0, t1)
                if len(f) == 0:
                    f = np.zeros((1, self.features.features[
                        self.features._key(fid)].shape[1]), np.float32)
                token_feats[tid] = f
            bank = TokenBank(token_feats)
            self._banks[mode] = bank
            self.device_samplers[mode] = DevicePairSampler(
                descr, proba, batch_size=self.batch_size,
                ratio_same_diff_spk=self.ratio_same_diff_spk,
                ratio_same_diff_type=self.ratio_same_diff_type)

    def bank_for(self, train_mode=True):
        self.load_data()
        return self._banks["train" if train_mode else "dev"]

    def sampler_for(self, train_mode=True):
        self.load_data()
        return self.device_samplers["train" if train_mode else "dev"]

    def steps_per_epoch(self, train_mode=True):
        return self.num_max_minibatches if train_mode else \
            max(self.num_max_minibatches // 10, 1)

    def batch_iterator(self, train_mode=True):
        raise TypeError(
            "OnDeviceSamplerDataLoader has no host batch iterator — pair "
            "sampling happens inside the jitted step; use it with "
            "TrainerSiamese, which detects it automatically.")


class MultiTaskDataLoader(OriginalDataLoader):
    """Adds speaker labels for the multitask network
    (reference dataloader.py:742-792)."""

    def __init__(self, pairs_path, features_path, fid2spk_file=None,
                 **kwargs):
        super().__init__(pairs_path, features_path, **kwargs)
        self.fid2spk_file = fid2spk_file

    def _build_token_bank(self, fid2spk=None):
        if fid2spk is None:
            fid2spk = read_spkid_file(self.fid2spk_file)
        super()._build_token_bank(fid2spk=fid2spk)

    def batch_iterator(self, train_mode=True):
        self.load_data()
        if self.align_backend == "bank":
            yield from self.bank_batch_iterator(train_mode)
            return
        mode = "train" if train_mode else "dev"
        fid2spk = read_spkid_file(self.fid2spk_file)
        batches, selected = self._select_batches(list(self.pairs[mode]))
        for idx in selected:
            grouped = group_pairs(batches[idx])
            if self.align_backend == "device":
                batch = self.load_frames_from_pairs_device(grouped,
                                                           fid2spk=fid2spk)
                if batch is not None:
                    yield batch
            else:
                X1, X2, y_spk, y_phn = self.load_frames_from_pairs(
                    grouped, fid2spk=fid2spk)
                yield Batch(jnp.asarray(X1), jnp.asarray(X2),
                            jnp.asarray(y_phn), None,
                            y_spk=jnp.asarray(y_spk))


class MultimodalDataLoader(FramesDataLoader):
    """Frame batches over multiple feature files; DTW paths come from the
    first modality (reference dataloader.py:794-980)."""

    def __init__(self, pairs_path, features_path, batch_size=500,
                 randomize_dataset=False, max_batches_per_epoch=None,
                 align_backend="device", steps_per_call=8):
        assert isinstance(features_path, (list, tuple)), \
            "MultimodalDataLoader takes a list of feature paths"
        super().__init__(pairs_path, features_path, batch_size,
                         randomize_dataset, max_batches_per_epoch,
                         align_backend=align_backend,
                         steps_per_call=steps_per_call)
        self.features_dict = None
        self.token_tables = {"train": None, "dev": None}

    def load_data(self):
        if self.features_dict is None:
            print("Loading features")
            self.features_dict = {}
            for path in self.features_path:
                self.features_dict[path], _, _ = read_feats(path)
        if self.pairs["train"] is None:
            print("Loading word pairs")
            self.pairs["train"] = read_dataset(
                os.path.join(self.pairs_path, "train_pairs/dataset"))
            self.pairs["dev"] = read_dataset(
                os.path.join(self.pairs_path, "dev_pairs/dataset"))
        for mode in ("train", "dev"):
            if self.token_tables[mode] is None:
                # alignment on the first modality
                self.features = self.features_dict[self.features_path[0]]
                table0, frames = self.load_all_frames(self.pairs[mode])
                tables = [table0]
                # same token row layout for the other modalities (assumes
                # equal per-token lengths across modalities, as the
                # reference does, reference dataloader.py:673-684)
                for path in self.features_path[1:]:
                    self.features = self.features_dict[path]
                    _, _, _, table = self._token_table(self.pairs[mode])
                    tables.append(table)
                self.token_tables[mode] = tables
                self.frame_pairs[mode] = frames

    def frame_tables(self, train_mode=True):
        """One device-resident table per modality, uploaded once."""
        self.load_data()
        mode = "train" if train_mode else "dev"
        if self._tables_dev.get(mode) is None:
            from abnet3_tpu.ops.bank import upload_rows
            self._tables_dev[mode] = tuple(
                upload_rows(np.asarray(t)) for t in self.token_tables[mode])
        return self._tables_dev[mode]

    def batch_iterator(self, train_mode=True):
        self.load_data()
        mode = "train" if train_mode else "dev"
        if self.align_backend != "host":
            # device path: per-modality tables live in HBM; a 500-frame
            # two-modality batch streams ~4 KB of indices instead of
            # ~1.1 MB of features
            self.frame_tables(train_mode)
            yield from self._index_batches(mode)
            return
        frames = self.frame_pairs[mode]
        tables = self.token_tables[mode]
        num_batches = max(len(frames) // self.batch_size, 1)
        for i in self._epoch_batch_ids(mode, num_batches):
            chunk = frames[i * self.batch_size:(i + 1) * self.batch_size]
            if len(chunk) == 0:
                continue
            X1_list = [jnp.asarray(t[chunk[:, 0]]) for t in tables]
            X2_list = [jnp.asarray(t[chunk[:, 1]]) for t in tables]
            y = jnp.asarray(chunk[:, 2].astype(np.float32))
            yield Batch(X1_list, X2_list, y)
