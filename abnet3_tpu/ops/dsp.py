"""Jitted acoustic front-end: STFT -> mel filterbank -> log (-> DCT).

Replaces the reference's external ``spectral`` dependency (reference
features.py:99-133): pre-emphasis 0.97, 25 ms Hamming windows at 100 fps,
power spectrum, triangular mel filters, log energies; optional DCT-II for
MFCCs and delta/delta-delta appends.

The whole per-file pipeline is one XLA computation: framing is a gather,
the DFT is an rfft, and the mel projection is a single (F, nfft/2+1) x
(nfft/2+1, nfilt) matmul that XLA places on the MXU. Waveforms are padded
to length buckets on the host so each bucket compiles once.

Numeric note: the reference's `spectral` package is not vendored in the
reference repo, so this is a standards-faithful reimplementation (HTK mel
scale 2595*log10(1+f/700)), not a bit-exact port; the reference's own test
suite asserts only CMVN exactness and stacking shapes
(reference test/test_features.py), which this front-end preserves exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mel_filterbank_matrix", "logmel_frames", "mfcc_frames",
           "spectral_frames_batch", "add_deltas", "stack_frames",
           "stack_frames_np", "num_frames"]


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank_matrix(nfilt: int, nfft: int, fs: float,
                          lowerf: float = 0.0,
                          upperf: Optional[float] = None) -> np.ndarray:
    """(nfft//2+1, nfilt) triangular mel filterbank (host-built constant)."""
    if upperf is None:
        upperf = fs / 2.0
    n_bins = nfft // 2 + 1
    mel_pts = np.linspace(_hz_to_mel(lowerf), _hz_to_mel(upperf), nfilt + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bin_freqs = np.arange(n_bins) * (fs / nfft)
    fb = np.zeros((n_bins, nfilt), np.float32)
    for m in range(nfilt):
        left, center, right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_freqs - left) / max(center - left, 1e-8)
        down = (right - bin_freqs) / max(right - center, 1e-8)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def num_frames(n_samples: int, fs: float, frate: float = 100.0,
               wlen: float = 0.025) -> int:
    """Frame count for a waveform: hop = fs/frate, full windows only."""
    wl = int(round(wlen * fs))
    step = int(round(fs / frate))
    if n_samples < wl:
        return 0
    return 1 + (n_samples - wl) // step


@functools.partial(jax.jit, static_argnames=("fs", "frate", "wlen", "nfft",
                                             "nfilt", "lowerf", "upperf",
                                             "alpha"))
def logmel_frames(waveform: jnp.ndarray, fs: int, frate: float = 100.0,
                  wlen: float = 0.025, nfft: int = 1024, nfilt: int = 40,
                  lowerf: float = 0.0, upperf: Optional[float] = None,
                  alpha: float = 0.97) -> jnp.ndarray:
    """Log mel filterbank energies for one (padded) waveform.

    waveform: (n,) float32. Returns (num_frames(n), nfilt).
    """
    n = waveform.shape[0]
    wl = int(round(wlen * fs))
    step = int(round(fs / frate))
    nf = num_frames(n, fs, frate, wlen)
    # framing via gather: (nf, wl)
    idx = (jnp.arange(nf)[:, None] * step + jnp.arange(wl)[None, :])
    frames = waveform[idx]
    # per-frame pre-emphasis: x[t] - alpha*x[t-1] (first sample vs itself
    # scaled, standard sphinx-style prior = previous sample within frame)
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - alpha * prev
    window = jnp.asarray(np.hamming(wl).astype(np.float32))
    frames = frames * window[None, :]
    spec = jnp.fft.rfft(frames, n=nfft, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)
    fb = jnp.asarray(mel_filterbank_matrix(nfilt, nfft, float(fs),
                                           lowerf, upperf))
    energies = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(energies, 1e-10))


@functools.partial(jax.jit, static_argnames=("fs", "frate", "wlen", "nfft",
                                             "nfilt", "ncep", "lowerf",
                                             "upperf", "alpha"))
def mfcc_frames(waveform: jnp.ndarray, fs: int, frate: float = 100.0,
                wlen: float = 0.025, nfft: int = 512, nfilt: int = 40,
                ncep: int = 13, lowerf: float = 100.0,
                upperf: float = 6855.4976, alpha: float = 0.97):
    """MFCCs: DCT-II (ortho) of the log mel energies, first `ncep` coeffs
    (reference features.py:116-133 parameterization)."""
    logmel = logmel_frames(waveform, fs, frate=frate, wlen=wlen, nfft=nfft,
                           nfilt=nfilt, lowerf=lowerf, upperf=upperf,
                           alpha=alpha)
    # DCT-II with orthonormal scaling, as a matmul (MXU-friendly)
    k = np.arange(nfilt)
    dct = np.cos(np.pi / nfilt * (k[:, None] + 0.5) * np.arange(ncep)[None, :])
    dct = dct * np.sqrt(2.0 / nfilt)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    return jnp.dot(logmel, jnp.asarray(dct.astype(np.float32)),
                   preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("method", "fs", "nfilt",
                                             "deltas", "deltasdeltas"))
def spectral_frames_batch(waveforms: jnp.ndarray, fs: int,
                          method: str = "fbanks", nfilt: int = 40,
                          deltas: bool = False,
                          deltasdeltas: bool = False) -> jnp.ndarray:
    """Batched front-end: (B, n) same-length padded waveforms -> (B, nf, d)
    features in ONE dispatch, deltas fused in.

    This is what makes the wav stage TPU-first: the per-file API pays one
    h2d RPC + one dispatch + one blocking d2h per wav (~100 ms+ each
    through the device tunnel); stacking a same-length bucket of B files
    into a single vmapped computation divides the dispatch count by B and
    hands XLA a (B*nf, nfft/2+1) x (nfft/2+1, nfilt) mel projection that
    actually fills the MXU. Same parameterization as the per-file
    functions (reference features.py:99-133); exact-parity with the
    per-file path is asserted in tests/test_features.py.
    """
    def one(w):
        if method == "fbanks":
            f = logmel_frames(w, fs, nfft=1024, nfilt=nfilt)
        else:
            f = mfcc_frames(w, fs, nfilt=nfilt, ncep=13)
        return add_deltas(f, deltas, deltasdeltas)

    # int16 wavs ship as-is (half the h2d bytes) and widen here; the cast
    # is value-exact so parity with the float32 per-file path holds
    return jax.vmap(one)(waveforms.astype(jnp.float32))


def add_deltas(feats: jnp.ndarray, do_deltas: bool,
               do_deltasdeltas: bool, window: int = 2) -> jnp.ndarray:
    """Append regression deltas (and delta-deltas) along the feature axis
    (reference features.py:110-111,129-130)."""
    if not do_deltas and not do_deltasdeltas:
        return feats

    def delta(x):
        denom = 2.0 * sum(n * n for n in range(1, window + 1))
        pad = jnp.concatenate([jnp.repeat(x[:1], window, 0), x,
                               jnp.repeat(x[-1:], window, 0)], axis=0)
        acc = jnp.zeros_like(x)
        T = x.shape[0]
        for n in range(1, window + 1):
            acc = acc + n * (pad[window + n:window + n + T]
                             - pad[window - n:window - n + T])
        return acc / denom

    parts = [feats]
    d = delta(feats)
    if do_deltas:
        parts.append(d)
    if do_deltasdeltas:
        parts.append(delta(d))
    return jnp.concatenate(parts, axis=1)


def stack_frames(feats: jnp.ndarray, nframes: int = 7) -> jnp.ndarray:
    """Stack each frame with its context: row t becomes the concatenation
    of frames [t - nframes//2, ..., t + nframes//2], zero-padded at the
    edges, earliest frame first (reference features.py:135-159)."""
    assert nframes % 2 == 1, "number of stacked frames must be odd"
    T, dim = feats.shape
    half = nframes // 2
    pad = jnp.zeros((half, dim), feats.dtype)
    padded = jnp.concatenate([pad, feats, pad], axis=0)
    cols = [padded[i:i + T] for i in range(nframes)]
    return jnp.concatenate(cols, axis=1)


def stack_frames_np(feats: np.ndarray, nframes: int = 7) -> np.ndarray:
    """Host-numpy twin of :func:`stack_frames` (bit-identical: both are
    concatenations of zero-padded shifts). Corpus-scale stacking is a pure
    memory op on data that already lives on the host after normalization —
    routing it through the device costs a round trip per file for zero
    compute win, so the features pipeline uses this path."""
    assert nframes % 2 == 1, "number of stacked frames must be odd"
    T, dim = feats.shape
    half = nframes // 2
    padded = np.concatenate(
        [np.zeros((half, dim), feats.dtype), feats,
         np.zeros((half, dim), feats.dtype)], axis=0)
    return np.concatenate([padded[i:i + T] for i in range(nframes)], axis=1)
