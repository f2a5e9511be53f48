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


def _butterfly_stage(vals, w, ac_out, ac_mask, stride):
    """One dyadic stage over the slot axis.

    Pair (j, j+stride) for lo slots j (j % 2*stride < stride):
      * both occupied: weighted butterfly — dc collapses to slot j,
        the AC is recorded at slot j+stride in ac_out,
      * only j+stride occupied: the survivor collapses to slot j (the
        pair's canonical position) so later stages can still merge it
        — this is what makes the block form equal to the dyadic
        Morton-code sweeps (reference fwdTransformBlock222 semantics),
      * only j occupied: passes through.
    """
    idx = jnp.arange(8)
    is_lo = (idx % (2 * stride)) < stride
    hi = jnp.where(is_lo & (idx + stride < 8), idx + stride, idx)

    v_lo = vals
    v_hi = vals[:, hi, :]
    w_lo = w
    w_hi = w[:, hi]

    pairable = is_lo[None, :]
    both = (w_lo > 0) & (w_hi > 0) & pairable
    only_hi = (w_lo <= 0) & (w_hi > 0) & pairable

    rs = jnp.sqrt(jnp.maximum(w_lo + w_hi, 1e-30))
    a = jnp.sqrt(jnp.maximum(w_lo, 0.0)) / rs
    b = jnp.sqrt(jnp.maximum(w_hi, 0.0)) / rs
    dc = a[..., None] * v_lo + b[..., None] * v_hi
    ac = -b[..., None] * v_lo + a[..., None] * v_hi

    out_v = jnp.where(both[..., None], dc, v_lo)
    out_v = jnp.where(only_hi[..., None], v_hi, out_v)
    out_w = jnp.where(both, w_lo + w_hi, w_lo)
    out_w = jnp.where(only_hi, w_hi, out_w)
    # hi slots are consumed (value moved down or turned into an AC)
    is_hi = ~is_lo[None, :]
    out_v = jnp.where(is_hi[..., None], 0.0, out_v)
    out_w = jnp.where(is_hi, 0.0, out_w)

    # record ACs at the hi slot positions
    lo_of_hi = jnp.where(is_lo, idx, idx - stride)
    merged_at_lo = both[:, lo_of_hi]
    ac_here = is_hi & merged_at_lo
    ac_val = ac[:, lo_of_hi, :]
    ac_out = jnp.where(ac_here[..., None], ac_val, ac_out)
    ac_mask = ac_mask | ac_here
    return out_v, out_w, ac_out, ac_mask


def _block_kernel(vals_ref, w_ref, out_v_ref, out_w_ref, mask_ref):
    vals = vals_ref[:]
    w = w_ref[:]
    ac_out = jnp.zeros_like(vals)
    ac_mask = jnp.zeros(w.shape, dtype=jnp.bool_)
    for stride in (1, 2, 4):
        vals, w, ac_out, ac_mask = _butterfly_stage(
            vals, w, ac_out, ac_mask, stride)
    # DC ends at slot 0; emit it there alongside the ACs
    out = ac_out.at[:, 0, :].set(vals[:, 0, :])
    out_v_ref[:] = out
    out_w_ref[:] = w
    mask_ref[:] = ac_mask.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def fwd_blocks(vals: jnp.ndarray, weights: jnp.ndarray,
               interpret: bool = False):
    """(B,8,C) float32 values + (B,8) float32 weights ->
    (coeffs, wout, ac_mask).

    coeffs slot 0 = block DC (weight wout[:,0]); slots with
    ac_mask != 0 hold the block's AC coefficients in dyadic order.
    """
    b, _, c = vals.shape
    pad = (-b) % BLOCK_TILE
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
    bp = vals.shape[0]
    grid = (bp // BLOCK_TILE,)
    out_v, out_w, ac_mask = pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_TILE, 8, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((BLOCK_TILE, 8), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_TILE, 8, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((BLOCK_TILE, 8), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_TILE, 8), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 8, c), vals.dtype),
            jax.ShapeDtypeStruct((bp, 8), weights.dtype),
            jax.ShapeDtypeStruct((bp, 8), jnp.int32),
        ],
        interpret=interpret,
    )(vals, weights)
    return out_v[:b], out_w[:b], ac_mask[:b]
