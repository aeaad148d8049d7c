#!/usr/bin/env python3
"""Embedders: trained network -> h5features embedding export.

Parity with the reference embedder surface (reference embedder.py:19-221)
with a TPU-first inference path: all file chunks are padded to one static
``(batch_size, d)`` shape so the whole corpus runs through a single
compiled forward kernel (the reference re-traces per chunk length and pays
a host->device->host round trip per chunk, reference embedder.py:85-96);
only one tower runs (the reference computes both siamese branches and
throws one away, reference embedder.py:92).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from abnet3_tpu.io.h5f import read_h5features, write_h5features
from abnet3_tpu.utils import EmbeddingObserver

__all__ = ["EmbedderBuilder", "EmbedderSiamese", "EmbedderSiameseMultitask",
           "MultimodalEmbedder", "encode_transfer", "decode_transfer"]


def encode_transfer(out, transfer_dtype: str):
    """Device-side transfer codec: shrink the bytes a chunk of embeddings
    ships over the device->host link (the export bottleneck on slow
    links; the files always store float32 — the codec only lives on the
    wire). Returns a tuple of leaves:

    - ``float32``: identity, 4 B/value.
    - ``bfloat16``: cast, 2 B/value, ~3 decimal digits.
    - ``int8``: per-chunk affine quantization ``q = round((x-lo)/scale)``
      with scalar lo/scale riding along, 1 B/value; roundtrip error is
      <= scale/2 = (hi-lo)/510 — for sigmoid/tanh-bounded embeddings
      that is ~2e-3 absolute, the same ballpark as bfloat16.
    - ``int4``: per-DIMENSION affine quantization packed two codes per
      uint8 (0.5 B/value + 8 B/dim of lo/scale per chunk). The error
      bound is (hi_d-lo_d)/30 PER DIMENSION, so narrow-range dims (the
      usual case for sigmoid towers: measured 7.7e-4 absolute / 1.9e-4
      mean angular-distance shift, tests/test_embedder.py) quantize far
      tighter than a whole-chunk scalar would; worst case (a dim
      spanning the full value range) is ~3% of that range — fine for
      ABX-style ranking of well-separated embeddings, too coarse for
      downstream numeric reuse, hence OPT-IN, never the default. Odd
      embedding dims pad one zero column on the wire.
    """
    import jax.numpy as jnp
    if transfer_dtype == "bfloat16":
        return (out.astype(jnp.bfloat16),)
    if transfer_dtype == "int8":
        lo = jnp.min(out)
        scale = jnp.maximum(jnp.max(out) - lo, 1e-12) / 255.0
        q = jnp.round((out - lo) / scale).astype(jnp.uint8)
        return (q, lo.astype(jnp.float32), scale.astype(jnp.float32))
    if transfer_dtype == "int4":
        lo = jnp.min(out, axis=0)
        scale = jnp.maximum(jnp.max(out, axis=0) - lo, 1e-12) / 15.0
        q = jnp.round((out - lo) / scale).astype(jnp.uint8)
        if q.shape[1] % 2:
            q = jnp.pad(q, ((0, 0), (0, 1)))
        packed = q[:, 0::2] | (q[:, 1::2] << 4)
        return (packed, lo.astype(jnp.float32), scale.astype(jnp.float32))
    return (out,)


def decode_transfer(leaves) -> np.ndarray:
    """Host-side inverse of :func:`encode_transfer` -> float32 array."""
    if len(leaves) == 1:
        host = np.asarray(leaves[0])
        return host if host.dtype == np.float32 \
            else host.astype(np.float32)
    q, lo, scale = (np.asarray(p) for p in leaves)
    if lo.ndim == 1:  # int4: per-dim affine, two codes per uint8
        d = lo.shape[0]
        un = np.empty((q.shape[0], 2 * q.shape[1]), np.float32)
        un[:, 0::2] = q & 0x0F
        un[:, 1::2] = q >> 4
        return un[:, :d] * scale[None, :] + lo[None, :]
    return q.astype(np.float32) * float(scale) + float(lo)


class EmbedderBuilder:
    """Generic embedder (reference embedder.py:19-50)."""

    def __init__(self, network=None, network_path=None, feature_path=None,
                 output_path=None, cuda=True, batch_size=5000, mesh=None,
                 transfer_dtype="float32", streaming=False):
        if network is None:
            raise ValueError("network is None.")
        assert transfer_dtype in ("float32", "bfloat16", "int8", "int4")
        self.network = network
        self.network_path = network_path
        self.feature_path = feature_path
        self.output_path = output_path
        self.cuda = cuda  # kept for YAML compat
        # jax.sharding.Mesh — or a YAML-friendly {"data": N, "model": M}
        # dict (gridsearch configs), like TrainerBuilder
        if isinstance(mesh, dict):
            from abnet3_tpu.parallel import make_mesh
            mesh = make_mesh(n_data=mesh.get("data"),
                             n_model=mesh.get("model", 1))
        self.mesh = mesh  # shard chunks over 'data'
        # transfer codec for the d2h embedding copies (the bottleneck on
        # slow links): 'bfloat16' halves bytes, 'int8' quarters them,
        # 'int4' eighths them (per-chunk affine quantization, see
        # encode_transfer for the error bounds — int4 is opt-in, ~1.7e-2
        # absolute); files always store float32
        self.transfer_dtype = transfer_dtype
        # streaming: read the input corpus item-by-item and append each
        # finished file's embeddings immediately — memory stays bounded
        # by (in-flight chunk window + one file) regardless of corpus
        # size (the reference, and the default path, load the whole
        # corpus into RAM, reference embedder.py:73-79)
        self.streaming = streaming
        if mesh is not None:
            # chunk rows must divide evenly over the data axis
            n_data = mesh.shape["data"]
            batch_size = ((batch_size + n_data - 1) // n_data) * n_data
        self.batch_size = batch_size

    def _load(self):
        if self.network_path is not None:
            self.network.load_network(self.network_path)
        else:
            self.network.ensure_init()
        print("Done loading network weights")

    def _forward_fn(self):
        network = self.network
        transfer_dtype = self.transfer_dtype

        def forward_impl(params, state, x):
            out, _ = network.forward_once(params, state, x, train=False)
            return (encode_transfer(out, transfer_dtype),)

        return self._jit_forward(forward_impl, n_heads=1)

    def _jit_forward(self, forward_impl, n_heads: int, n_modalities=1):
        """jit a forward that returns ``n_heads`` encoded heads (each a
        tuple of codec leaves, see encode_transfer). With a mesh, frames
        shard over 'data' (data-parallel inference, params replicated);
        codec scalars replicate."""
        if self.mesh is None:
            return jax.jit(forward_impl)
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        head = ((dp, rep, rep) if self.transfer_dtype in ("int8", "int4")
                else (dp,))
        return jax.jit(forward_impl,
                       in_shardings=(None, None) + (dp,) * n_modalities,
                       out_shardings=(head,) * n_heads)

    def _pad_target(self, n: int) -> int:
        """Padded row count for a tail chunk: the smallest rung of a /4
        bucket ladder under batch_size (floored at 256 rows, rounded up
        to the mesh data axis) that holds ``n``. Full chunks stay at
        batch_size; the bounded ladder keeps the executable count at
        <= 3-4 shapes while a short tail no longer ships a full
        batch_size of padding (round-4: a 60-frame tail padded to 4096
        rows is 4.6 MB of h2d for 67 KB of data)."""
        n_data = self.mesh.shape["data"] if self.mesh is not None else 1
        floor = max(256, n_data)
        sizes = [self.batch_size]
        while sizes[-1] // 4 >= floor:
            sizes.append(-(-(sizes[-1] // 4) // n_data) * n_data)
        for s in sorted(sizes):
            if n <= s:
                return s
        return self.batch_size

    def _embed_corpus(self, forward, feats_list, n_outputs: int = 1):
        """Embed every file's frames through fixed-size padded chunks.

        PACKED: all files' frames form one virtual stream and chunks are
        cut from the stream across file boundaries, so the corpus costs
        ``ceil(total_frames / batch_size)`` dispatches however the
        frames are split into files (round-4: 1,152 ~60-frame files paid
        1,152 padded 4096-row dispatches = 248 s of mostly-padding h2d
        through the dev tunnel; packed, the same corpus is ~17). Safe
        because every embed forward is row-independent in eval mode (MLP
        towers, running-stats batch-norm, per-row multimodal attention).
        The tail chunk pads to the _pad_target ladder by replicating the
        last valid row (pad rows are discarded, but their outputs enter
        the int8 codec's per-chunk min/max — zero rows would widen the
        quantization range).

        Fully pipelined: all chunk forwards are dispatched asynchronously
        and device->host copies are started as results complete, so
        compute, h2d and d2h transfers overlap across the whole corpus
        (the reference synchronizes per chunk, reference embedder.py:88-96).

        ``forward`` returns a tuple of ``n_outputs`` heads per chunk
        (multitask spk/phn, multimodal emb+attention), each head an
        encoded leaf tuple (encode_transfer); returns one corpus list
        per head (decoded float32).

        A ``feats_list`` entry may be a tuple of per-modality arrays
        (equal frame counts); each modality is chunked/padded in sync and
        ``forward`` receives one positional array per modality.
        """
        bs = self.batch_size
        params, state = self.network.params, self.network.state
        mods_list = [feat if isinstance(feat, tuple) else (feat,)
                     for feat in feats_list]
        n_mod = len(mods_list[0]) if mods_list else 1
        lens = []
        for mods in mods_list:
            assert all(len(m) == len(mods[0]) for m in mods), \
                "modalities must have the same frame count per file"
            lens.append(len(mods[0]))
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        total = int(offsets[-1])
        if total == 0:
            # all-empty corpus: probe one ladder-rung zero forward so the
            # (0, d) outputs still carry the heads' true dims (a (0, 0)
            # feature set writes a malformed h5features container)
            dims = ([int(m.shape[1]) for m in mods_list[0]]
                    if mods_list and all(getattr(m, "ndim", 0) == 2
                                         for m in mods_list[0]) else None)
            if dims is None:
                head_d = [0] * n_outputs
            else:
                t = self._pad_target(1)
                embs = forward(params, state, *[
                    jnp.zeros((t, d), jnp.float32) for d in dims])
                head_d = [decode_transfer(h).shape[1] for h in embs]
            out = [[np.zeros((0, head_d[h]), np.float32)
                    for _ in feats_list] for h in range(n_outputs)]
            return out[0] if n_outputs == 1 else out
        out_heads = [None] * n_outputs  # (total, d_h), sized on 1st drain
        window = 16  # in-flight chunks: keeps device memory O(window)
        pending = []  # (row_start, valid_rows, device_buffers)

        def drain_one():
            c0, valid, embs = pending.pop(0)
            for h, head in enumerate(embs):
                dec = decode_transfer(head)[:valid]
                if out_heads[h] is None:
                    out_heads[h] = np.empty((total, dec.shape[1]),
                                            np.float32)
                out_heads[h][c0:c0 + valid] = dec

        fi = 0
        for c0 in range(0, total, bs):
            valid = min(bs, total - c0)
            target = bs if valid == bs else self._pad_target(valid)
            pieces = [[] for _ in range(n_mod)]
            got = 0
            while got < valid:
                while lens[fi] <= c0 + got - offsets[fi]:
                    fi += 1  # skip exhausted / empty files
                a = c0 + got - offsets[fi]
                take = min(lens[fi] - a, valid - got)
                for k in range(n_mod):
                    pieces[k].append(np.asarray(
                        mods_list[fi][k][a:a + take], np.float32))
                got += take
            chunks = []
            for k in range(n_mod):
                chunk = (pieces[k][0] if len(pieces[k]) == 1
                         else np.concatenate(pieces[k]))
                if target > valid:
                    chunk = np.vstack([chunk, np.repeat(
                        chunk[-1:], target - valid, axis=0)])
                chunks.append(jnp.asarray(chunk))
            embs = forward(params, state, *chunks)
            for head in embs:
                for leaf in head:
                    try:
                        leaf.copy_to_host_async()
                    except AttributeError:
                        pass
            pending.append((c0, valid, embs))
            if len(pending) >= window:
                drain_one()
        while pending:
            drain_one()
        corpora = [[out_heads[h][offsets[i]:offsets[i + 1]]
                    for i in range(len(feats_list))]
                   for h in range(n_outputs)]
        return corpora[0] if n_outputs == 1 else corpora

    def _embed_array(self, forward, feat: np.ndarray) -> np.ndarray:
        """Embed one file (kept for API compat); see _embed_corpus."""
        return self._embed_corpus(forward, [feat])[0]

    def _embed_streaming(self, forward, stream, on_file_done,
                         n_outputs: int = 1):
        """Streaming twin of :func:`_embed_corpus`: ``stream`` yields
        ``(item, labels, frames)``; each file's decoded embeddings are
        handed to ``on_file_done(item, labels, [per-head arrays])`` as
        soon as its last chunk drains. PACKED like the corpus path:
        frames from consecutive files fill one chunk (a chunk records
        its (file, rows) spans and splits on drain), so many short
        files do not multiply the dispatch count. Same async pipeline
        (dispatch ahead, overlapped d2h through a bounded window);
        memory is O(window + current file), never the whole corpus.
        ``on_file_done`` fires strictly in stream order (h5features
        appends positionally), including 0-frame files, which emit as
        (0, d) arrays — if one precedes every forward, it waits for the
        first drain (or an end-of-stream probe forward) to learn d."""
        bs = self.batch_size
        params, state = self.network.params, self.network.state
        window = 16
        pending = []   # (spans, valid_rows, heads)
        live = {}      # file_seq -> [item, labels, [parts]*heads, n_left]
        buf = []       # [(file_seq, rows-array)] not yet dispatched
        buf_rows = 0
        head_dims = [None] * n_outputs
        in_dim = None  # feature dim, for the all-empty-stream probe

        def emit_ready():
            # emit completed files from the front of `live` (insertion =
            # stream order): a later file never finishes a drain before
            # an earlier one, so this preserves corpus order exactly
            while live:
                seq = next(iter(live))
                item, labels, parts, n_left = live[seq]
                if n_left != 0:
                    return
                if parts[0]:
                    out = [p[0] if len(p) == 1 else np.vstack(p)
                           for p in parts]
                elif head_dims[0] is not None:
                    out = [np.zeros((0, head_dims[h]), np.float32)
                           for h in range(n_outputs)]
                else:  # 0-frame file before any forward: dims unknown
                    return
                del live[seq]
                on_file_done(item, labels, out)

        def drain_one():
            spans, valid, heads = pending.pop(0)
            decs = [decode_transfer(head)[:valid] for head in heads]
            for h, d in enumerate(decs):
                head_dims[h] = d.shape[1]
            r = 0
            for seq, k in spans:
                rec = live[seq]
                for h in range(n_outputs):
                    rec[2][h].append(decs[h][r:r + k])
                rec[3] -= k
                r += k
            emit_ready()

        def dispatch(valid):
            nonlocal buf, buf_rows
            spans, pieces, got = [], [], 0
            while got < valid:
                seq, rows = buf[0]
                take = min(len(rows), valid - got)
                spans.append((seq, take))
                pieces.append(rows[:take])
                if take == len(rows):
                    buf.pop(0)
                else:
                    buf[0] = (seq, rows[take:])
                got += take
            buf_rows -= valid
            chunk = pieces[0] if len(pieces) == 1 else np.vstack(pieces)
            target = bs if valid == bs else self._pad_target(valid)
            if target > valid:
                # last-row replication (keeps the int8 codec's min/max
                # on valid-row outputs)
                chunk = np.vstack([chunk, np.repeat(
                    chunk[-1:], target - valid, axis=0)])
            heads = forward(params, state, jnp.asarray(chunk))
            for head in heads:
                for leaf in head:
                    try:
                        leaf.copy_to_host_async()
                    except AttributeError:
                        pass
            pending.append((spans, valid, heads))
            if len(pending) >= window:
                drain_one()

        for seq, (item, labels, feat) in enumerate(stream):
            feat = np.asarray(feat, np.float32)
            if feat.ndim == 2:
                in_dim = feat.shape[1]
            live[seq] = [item, labels,
                         [[] for _ in range(n_outputs)], len(feat)]
            if len(feat) == 0:
                emit_ready()
                continue
            buf.append((seq, feat))
            buf_rows += len(feat)
            while buf_rows >= bs:
                dispatch(bs)
        if buf_rows:
            dispatch(buf_rows)
        while pending:
            drain_one()
        if live:
            # only 0-frame files can remain: the stream never ran a
            # forward (all files empty), so probe one ladder-rung zero
            # chunk for the head dims, as _embed_corpus does
            if head_dims[0] is None and in_dim is not None:
                heads = forward(params, state, jnp.zeros(
                    (self._pad_target(1), in_dim), jnp.float32))
                for h, head in enumerate(heads):
                    head_dims[h] = decode_transfer(head).shape[1]
            if head_dims[0] is None:
                head_dims = [0] * n_outputs
            emit_ready()
        assert not live

    def embed(self):
        raise NotImplementedError("Unimplemented embed for class:",
                                  self.__class__.__name__)


class EmbedderSiamese(EmbedderBuilder):
    """Monotask embedding export (reference embedder.py:53-100)."""

    def embed(self):
        from abnet3_tpu.profiling import stage_trace
        self._load()
        forward = self._forward_fn()
        if self.streaming:
            from abnet3_tpu.io.h5f import iter_h5features
            if _exists(self.output_path):
                _remove(self.output_path)
            writer = _BatchedWriter(self.output_path, "features")
            with stage_trace("embed"):
                self._embed_streaming(
                    forward, iter_h5features(self.feature_path,
                                             "features"),
                    lambda item, labels, embs: writer.add(
                        item, labels, embs[0]))
            writer.flush()
            return
        data = read_h5features(self.feature_path, "features")
        print("Done loading input feature file")
        with stage_trace("embed"):
            embeddings = self._embed_corpus(forward, data.features())
        if _exists(self.output_path):
            _remove(self.output_path)
        write_h5features(self.output_path, "features", data.items(),
                         data.labels(), embeddings)


class EmbedderSiameseMultitask(EmbedderBuilder):
    """Writes separate .spk / .phn embedding files
    (reference embedder.py:103-149)."""

    def embed(self):
        self._load()
        network = self.network

        transfer_dtype = self.transfer_dtype

        def forward_impl(params, state, x):
            spk, phn, _ = network.forward_once(params, state, x,
                                               train=False)
            return (encode_transfer(spk, transfer_dtype),
                    encode_transfer(phn, transfer_dtype))

        forward = self._jit_forward(forward_impl, n_heads=2)

        if self.streaming:
            from abnet3_tpu.io.h5f import iter_h5features
            writers = []
            for suffix in (".spk", ".phn"):
                path = self.output_path + suffix
                if _exists(path):
                    _remove(path)
                writers.append(_BatchedWriter(path, "features"))

            def on_done(item, labels, embs):
                for w, e in zip(writers, embs):
                    w.add(item, labels, e)

            self._embed_streaming(
                forward, iter_h5features(self.feature_path, "features"),
                on_done, n_outputs=2)
            for w in writers:
                w.flush()
            return

        data = read_h5features(self.feature_path, "features")
        # both heads ride the pipelined corpus path (async dispatch +
        # overlapped d2h), same as the monotask embedder
        emb_spk, emb_phn = self._embed_corpus(forward, data.features(),
                                              n_outputs=2)

        for suffix, embs in ((".spk", emb_spk), (".phn", emb_phn)):
            path = self.output_path + suffix
            if _exists(path):
                _remove(path)
            write_h5features(path, "features", data.items(), data.labels(),
                             embs)


class MultimodalEmbedder(EmbedderBuilder):
    """Multimodal embedding export with attention-weight observers
    (reference embedder.py:151-221)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.observers: List[EmbeddingObserver] = []
        from abnet3_tpu.integration import BiWeightedDeepLearnt
        if isinstance(getattr(self.network, "integration_unit", None),
                      BiWeightedDeepLearnt):
            print("Placing observer to save learnt attention weights")
            self.observers.append(EmbeddingObserver(
                self.network.integration_unit.get_weights,
                self.output_path + "attention_weights.features"))

    def embed(self):
        """TPU-first multimodal export: one jitted multi-input forward over
        fixed-size padded chunks, pipelined through the same async-d2h
        corpus path as the monotask embedder (the reference runs one eager
        forward per file, reference embedder.py:195-208).

        Attention weights are RETURNED by the jitted forward instead of
        read back from integration-unit object state afterwards — under
        jit that state only ever holds the stale tracer from trace time.
        """
        self._load()
        if self.streaming:
            print("WARNING: streaming=True is not supported by "
                  "MultimodalEmbedder (modalities must be joined per "
                  "item); loading the full corpora instead")
        datasets = [read_h5features(p, "features")
                    for p in self.feature_path]
        items = datasets[0].items()
        times = datasets[0].labels()
        print("Done loading input feature file")
        network = self.network
        unit = getattr(network, "integration_unit", None)
        want_attention = bool(self.observers)
        transfer_dtype = self.transfer_dtype

        def forward_impl(params, state, *xs):
            if want_attention:
                unit._last_weight = None  # trace-time reset (see below)
            emb, _ = network.forward_once(params, state, list(xs),
                                          train=False)
            outs = [encode_transfer(emb, transfer_dtype)]
            if want_attention:
                # apply() stored this trace's attention tensor; None means
                # the unit is frozen to a scalar (headstart)
                w = unit._last_weight
                if w is None:
                    w = jnp.full((xs[0].shape[0], 1),
                                 float(unit.get_weights()))
                outs.append(encode_transfer(w, transfer_dtype))
            return tuple(outs)

        forward = self._jit_forward(
            forward_impl, n_heads=2 if want_attention else 1,
            n_modalities=len(datasets))

        # join modalities BY ITEM NAME, not file position: feature files
        # regenerated with different enumeration orders would otherwise
        # silently pair modality-1 of one utterance with modality-2 of
        # another (a positional zip only fails later, and only if the
        # item counts happen to differ)
        cols = [datasets[0].features()]
        for p, d in zip(self.feature_path[1:], datasets[1:]):
            idx = {it: i for i, it in enumerate(d.items())}
            absent = [it for it in items if it not in idx]
            if absent:
                raise KeyError("items in %s missing from modality file "
                               "%s: %s" % (self.feature_path[0], p,
                                           absent[:5]))
            fs = d.features()
            cols.append([fs[idx[it]] for it in items])
        feats_list = [tuple(col[i] for col in cols)
                      for i in range(len(items))]
        n_outputs = 2 if want_attention else 1
        result = self._embed_corpus(forward, feats_list,
                                    n_outputs=n_outputs)
        embeddings = result[0] if want_attention else result

        path = self.output_path + "embedded.features"
        if _exists(path):
            _remove(path)
        write_h5features(path, "features", items, times, embeddings)
        if want_attention:
            for observer in self.observers:
                observer.record_arrays(result[1])
                observer.save(items, times)


class _BatchedWriter:
    """Accumulate finished files and append them to the output
    h5features container in batches (one h5py reopen per flush, not per
    file — write_h5features is append-aware)."""

    def __init__(self, path: str, group: str, flush_every: int = 32):
        self.path = path
        self.group = group
        self.flush_every = flush_every
        self._items: List[str] = []
        self._labels: List[np.ndarray] = []
        self._feats: List[np.ndarray] = []

    def add(self, item, labels, feats):
        self._items.append(item)
        self._labels.append(labels)
        self._feats.append(feats)
        if len(self._items) >= self.flush_every:
            self.flush()

    def flush(self):
        if self._items:
            write_h5features(self.path, self.group, self._items,
                             self._labels, self._feats)
            self._items, self._labels, self._feats = [], [], []


def _exists(path):
    import os
    return os.path.exists(path)


def _remove(path):
    import os
    os.remove(path)
