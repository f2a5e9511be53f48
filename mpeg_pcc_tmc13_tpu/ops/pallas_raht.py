"""Pallas TPU kernel: dense RAHT 2x2x2-block butterfly.

The reference transforms one 2x2x2 block with 12 two-point butterflies
(`fwdTransformBlock222`, RAHT.cpp:672-737).  On TPU the natural unit is
a *batch* of blocks: XLA gathers each occupied block's (up to) 8 child
values + weights into dense (B, 8, C) / (B, 8) tensors (empty slots
weight 0), and this kernel runs the three butterfly stages for the
whole batch inside VMEM — regular shapes, no scatter/gather in-kernel,
VPU-elementwise math.  Stage s pairs slot j with slot j + 2**s for
slots where j % 2**(s+1) < 2**s (the classic dyadic z,y,x order,
matching ops/raht.py's sweep semantics on Morton codes).

Weighted butterfly per pair (w1, w2 > 0):
    dc = (sqrt(w1) v1 + sqrt(w2) v2) / sqrt(w1+w2)
    ac = (-sqrt(w2) v1 + sqrt(w1) v2) / sqrt(w1+w2)
Empty partners (w == 0) pass values through unchanged; weights add.

Outputs: transformed coefficients in-place layout (B, 8, C) where the
DC of the block lands in slot 0 and each pair's AC stays in the upper
slot, plus the accumulated block weight tree needed by dequantisation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_TILE = 256  # blocks per grid step


def _butterfly_stage(vals, w, stride):
    """One dyadic stage over slot axis (B, 8, C) / (B, 8)."""
    idx = jnp.arange(8)
    is_lo = (idx % (2 * stride)) < stride
    lo = idx
    hi = idx + stride
    hi = jnp.where(is_lo & (hi < 8), hi, idx)

    v_lo = vals
    v_hi = vals[:, hi, :]
    w_lo = w
    w_hi = w[:, hi]

    both = (w_lo > 0) & (w_hi > 0) & is_lo[None, :]
    ws = jnp.where(both, w_lo + w_hi, w_lo)
    sq_lo = jnp.sqrt(jnp.maximum(w_lo, 0.0))
    sq_hi = jnp.sqrt(jnp.maximum(w_hi, 0.0))
    rs = jnp.sqrt(jnp.maximum(w_lo + w_hi, 1e-30))
    a = sq_lo / rs
    b = sq_hi / rs

    dc = a[..., None] * v_lo + b[..., None] * v_hi
    ac = -b[..., None] * v_lo + a[..., None] * v_hi

    # lo slot of an active pair -> dc; its hi partner -> ac
    is_hi_of_pair = jnp.zeros((vals.shape[0], 8), bool)
    # partner-of: hi slot receives the ac computed at its lo slot
    lo_of_hi = idx - stride
    valid_hi = ((idx % (2 * stride)) >= stride)
    pair_at_lo = both[:, jnp.where(valid_hi, lo_of_hi, idx)]
    take_ac = valid_hi[None, :] & pair_at_lo
    ac_from_lo = ac[:, jnp.where(valid_hi, lo_of_hi, idx), :]

    out_v = jnp.where(both[..., None], dc, v_lo)
    out_v = jnp.where(take_ac[..., None], ac_from_lo, out_v)
    out_w = jnp.where(both, ws, w_lo)
    out_w = jnp.where(take_ac, 0.0, out_w)
    return out_v, out_w


def _block_kernel(vals_ref, w_ref, out_v_ref, out_w_ref):
    vals = vals_ref[:]
    w = w_ref[:]
    for stride in (1, 2, 4):
        vals, w = _butterfly_stage(vals, w, stride)
    out_v_ref[:] = vals
    out_w_ref[:] = w


@partial(jax.jit, static_argnames=("interpret",))
def fwd_blocks(vals: jnp.ndarray, weights: jnp.ndarray,
               interpret: bool = False):
    """(B,8,C) float32 values + (B,8) float32 weights -> (coeffs, wout).

    coeffs slot 0 = block DC, other occupied-pair slots = ACs.
    """
    b, _, c = vals.shape
    pad = (-b) % BLOCK_TILE
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
    bp = vals.shape[0]
    grid = (bp // BLOCK_TILE,)
    out_v, out_w = pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_TILE, 8, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((BLOCK_TILE, 8), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_TILE, 8, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((BLOCK_TILE, 8), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 8, c), vals.dtype),
            jax.ShapeDtypeStruct((bp, 8), weights.dtype),
        ],
        interpret=interpret,
    )(vals, weights)
    return out_v[:b], out_w[:b]
