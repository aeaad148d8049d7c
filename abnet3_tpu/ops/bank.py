"""Device-resident token bank: the whole training corpus lives in HBM.

The reference re-copies every token's frames host->GPU on every batch
(reference trainer.py:218-221). A 1-hour speech corpus is only ~0.4 GB of
stacked filterbanks — it fits in TPU HBM whole. So we upload every unique
token once, padded into one (N_tokens, T_max, d) bank, and each training
step receives only int32 token-index arrays (a few hundred bytes): pair
assembly becomes an on-device gather feeding the fused
DTW-align + train step, and steady-state training streams no feature bytes
from the host at all.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TokenBank", "BankView", "upload_rows"]


def _bucket(n: int, minimum: int = 16) -> int:
    """Round up to a multiple of 16 (sublane-aligned). A bank is built
    once per run, so unlike per-batch padding there is no recompile
    pressure pushing towards power-of-two buckets — and the DTW DP cost
    is quadratic in the padded length."""
    return max(minimum, ((n + 15) // 16) * 16)


# single h2d transfers near/past the GB mark are where the dev tunnel
# misbehaves (CLAUDE.md; eval.abx_device.upload_matrix chunks for the
# same reason): ship the bank in <=64 MB row slices and concatenate on
# device — the per-chunk RPC overhead (~100 ms) is noise against the
# minutes a GB-scale corpus spends on the wire, and each chunk's
# completion keeps the link demonstrably alive instead of one opaque
# multi-minute call
_UPLOAD_CHUNK_BYTES = 64 << 20


def upload_rows(arr: np.ndarray) -> jnp.ndarray:
    """Host (N, ...) array -> one device array, uploaded in row chunks
    of <= ``_UPLOAD_CHUNK_BYTES``."""
    row_bytes = max(1, int(np.prod(arr.shape[1:])) * arr.itemsize)
    rows_per = max(1, _UPLOAD_CHUNK_BYTES // row_bytes)
    if len(arr) <= rows_per:
        return jnp.asarray(arr)
    parts = [jax.device_put(np.ascontiguousarray(arr[r:r + rows_per]))
             for r in range(0, len(arr), rows_per)]
    return jnp.concatenate(parts, axis=0)


@jax.tree_util.register_pytree_node_class
class BankView:
    """Pytree view of a TokenBank: the table/lengths cross jit
    boundaries as ARGUMENTS instead of closed-over constants.

    A device array a jitted function closes over lowers into the HLO as
    a literal: the executable then CONTAINS the corpus, so through a
    remote compile service the request body carries it on every step/
    tile compile (~420 MB at N=8192, T=128, d=100 — rejected with HTTP
    413; smaller corpora 'work' but re-upload the corpus per compiled
    executable). Passing a BankView argument keeps the HLO a few KB —
    the table is an ordinary runtime parameter, already device-resident.
    Static metadata (max_len, dim) rides in the pytree aux so trace-time
    length bucketing still sees Python ints."""

    def __init__(self, bank: jnp.ndarray, lengths: jnp.ndarray,
                 max_len: int, dim: int):
        self.bank = bank
        self.lengths = lengths
        self.max_len = max_len
        self.dim = dim

    def __len__(self):
        return self.bank.shape[0]

    def take(self, idx: jnp.ndarray, max_frames: int = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """On-device gather: (B,) token ids -> ((B, T, d) frames, (B,)
        lengths); ``max_frames`` statically slices the time axis."""
        if max_frames is None or max_frames >= self.max_len:
            return self.bank[idx], self.lengths[idx]
        return (self.bank[:, :max_frames][idx],
                jnp.minimum(self.lengths[idx], max_frames))

    def tree_flatten(self):
        return (self.bank, self.lengths), (self.max_len, self.dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


class TokenBank:
    """Padded device array of token feature matrices + host key index."""

    def __init__(self, token_feats: Dict, max_frames: int = None):
        """token_feats: {key: (T_i, d) float32 array}."""
        self.keys = list(token_feats.keys())
        self.key_to_id = {k: i for i, k in enumerate(self.keys)}
        lens = [len(token_feats[k]) for k in self.keys]
        T = _bucket(max(max(lens), 1))
        if max_frames is not None:
            T = min(T, _bucket(max_frames))
        d = next(iter(token_feats.values())).shape[1]
        bank = np.zeros((len(self.keys), T, d), np.float32)
        for i, k in enumerate(self.keys):
            f = token_feats[k]
            n = min(len(f), T)
            bank[i, :n] = f[:n]
        self.max_len = T
        self.dim = d
        self.bank = upload_rows(bank)         # one-time h2d upload
        # host copy first: reading lengths back from the device costs an
        # RPC per call through the TPU tunnel
        self.lengths_host = np.minimum(np.asarray(lens, np.int32), T)
        self.lengths = jnp.asarray(self.lengths_host)

    def __len__(self):
        return len(self.keys)

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.bank.shape)) * 4

    def ids(self, keys: Sequence) -> np.ndarray:
        return np.asarray([self.key_to_id[k] for k in keys], np.int32)

    def take(self, idx: jnp.ndarray, max_frames: int = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """On-device gather: (B,) token ids -> ((B, T, d) frames, (B,)
        lengths). ``max_frames`` statically slices the time axis (length
        bucketing: short pairs run small DTW shapes)."""
        if max_frames is None or max_frames >= self.max_len:
            return self.bank[idx], self.lengths[idx]
        return (self.bank[:, :max_frames][idx],
                jnp.minimum(self.lengths[idx], max_frames))

    def bucket_for(self, n: int) -> int:
        """Smallest value of the coarse ladder {16, 32, 64, ...,
        max_len} that covers n: few compile variants, quadratic DP
        savings for short pairs."""
        b = 16
        while b < n and b < self.max_len:
            b *= 2
        return min(b, self.max_len)

    def view(self) -> BankView:
        """Jit-argument view (see :class:`BankView`): pass this through
        the jit boundary instead of closing over the TokenBank."""
        return BankView(self.bank, self.lengths, self.max_len, self.dim)
