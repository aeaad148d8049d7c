"""Pallas TPU kernel for the batched DTW dynamic program.

Computes the same DP as :func:`abnet3_tpu.ops.dtw.dtw_costs` but as one
Mosaic kernel: a block of pairs' cost matrices is staged in VMEM and the
row recurrence runs entirely on-chip — one kernel launch instead of a
T1-step XLA scan, no HBM round-trips between rows.

Per row the (min,+) recurrence uses the same closed form as the XLA path:

    D[i, j] = S[j] + min(x0, cummin_{k<=j}(m[k] - S[k-1]))

with the cumulative min computed by log-doubling shifts on the VPU. The
batch block dimension is the sublane axis, T2 the lane axis, so every row
step is a dense (BLOCK_B, T2) VPU op.

Falls back transparently to the XLA scan when Pallas is unavailable
(CPU tests run this kernel in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["dtw_costs_pallas"]

_BIG = 1e30  # plain float: jnp constants cannot be captured by a kernel
BLOCK_B = 8  # minimum block; the call picks the largest VMEM-fitting block


def _pick_block(B: int, T1: int, T2: int,
                vmem_budget: int = 8 * 1024 * 1024) -> int:
    """TPU grid iterations run sequentially, so bigger batch blocks mean
    fewer sequential kernel bodies; cap by VMEM (in + out block)."""
    per_pair = T1 * T2 * 4 * 2
    block = BLOCK_B
    while block * 2 <= max(B, BLOCK_B) and (block * 2) * per_pair \
            <= vmem_budget:
        block *= 2
    return block


def _shift_right(x, k, fill):
    B = x.shape[0]
    return jnp.concatenate(
        [jnp.full((B, k), jnp.float32(fill)), x[:, :-k]], axis=1)


def _prefix_sum(x):
    """Inclusive row prefix sum by log-doubling shifts (Mosaic has no
    cumsum lowering)."""
    T = x.shape[1]
    shift = 1
    while shift < T:
        x = x + _shift_right(x, shift, 0.0)
        shift *= 2
    return x


def _prefix_min(x):
    T = x.shape[1]
    shift = 1
    while shift < T:
        x = jnp.minimum(x, _shift_right(x, shift, _BIG))
        shift *= 2
    return x


def _dtw_kernel(dist_ref, out_ref):
    """dist_ref/out_ref: (BLOCK_B, T1, T2) VMEM blocks."""
    T1 = dist_ref.shape[1]
    B = dist_ref.shape[0]

    row0 = _prefix_sum(dist_ref[:, 0, :])
    out_ref[:, 0, :] = row0

    def row_step(i, prev):
        c = dist_ref[:, i, :]
        m = jnp.minimum(prev, _shift_right(prev, 1, _BIG))
        x0 = prev[:, :1] + c[:, :1]
        # S[j] = sum_{t=1..j} c[t]; S[0] = 0
        S = _prefix_sum(jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32), c[:, 1:]], axis=1))
        b = m - _shift_right(S, 1, -_BIG)
        x = S + jnp.minimum(_prefix_min(b), x0)
        out_ref[:, i, :] = x
        return x

    jax.lax.fori_loop(1, T1, row_step, row0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dtw_costs_pallas(dist: jnp.ndarray, interpret: bool = False
                     ) -> jnp.ndarray:
    """Batched DTW DP cost tensor via a Pallas kernel.

    dist: (B, T1, T2) float32, B padded to a multiple of BLOCK_B by the
    caller or internally here.
    """
    B, T1, T2 = dist.shape
    block = _pick_block(B, T1, T2)
    pad = (-B) % block
    if pad:
        dist = jnp.concatenate(
            [dist, jnp.zeros((pad, T1, T2), dist.dtype)], axis=0)
    Bp = B + pad
    out = pl.pallas_call(
        _dtw_kernel,
        grid=(Bp // block,),
        in_specs=[pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, T1, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T1, T2), jnp.float32),
        interpret=interpret,
    )(dist.astype(jnp.float32))
    return out[:B]
