"""Pallas TPU kernel: dense RAHT 2x2x2-block butterfly.

The reference transforms one 2x2x2 block with 12 two-point butterflies
(`fwdTransformBlock222`, RAHT.cpp:672-737).  On TPU the natural unit is
a *batch* of blocks: XLA gathers each occupied block's (up to) 8 child
values + weights into dense (B, 8, C) / (B, 8) tensors (empty slots
weight 0), and this kernel runs the three butterfly stages for the
whole batch inside VMEM.

Mosaic-friendly design: the 8 slots and the three dyadic stages are
fully unrolled with *static* pair indices — no gathers, no iota, no
dynamic slicing in-kernel — and the batch rides the lane dimension
(operands are laid out (8, C, B) / (8, 1, B) so every in-kernel array
is a 2-D (C, B)/(1, B) tile).  This is what lets the kernel lower on
real TPUs (the previous gather-based form only ran in interpret mode).

Weighted butterfly per pair (w1, w2 > 0):
    dc = (sqrt(w1) v1 + sqrt(w2) v2) / sqrt(w1+w2)
    ac = (-sqrt(w2) v1 + sqrt(w1) v2) / sqrt(w1+w2)
Empty partners (w == 0) pass values through unchanged; weights add.
A lone hi-slot survivor collapses to the pair's lo slot so later
stages can still merge it (matching ops/raht.py's dyadic Morton-code
sweep semantics).

Outputs (same layout as the inputs, transposed back to (B, 8, C)):
the block DC lands in slot 0 and each merged pair's AC stays in the
upper slot; plus the accumulated weights and an AC-position mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_TILE = 256  # blocks per grid step (lane dimension)

# dyadic pair schedule: (lo, hi) with stride 1 (z), 2 (y), 4 (x)
_STAGES = (
    ((0, 1), (2, 3), (4, 5), (6, 7)),
    ((0, 2), (4, 6)),
    ((0, 4),),
)


def _block_kernel(vals_ref, w_ref, out_v_ref, out_w_ref, mask_ref):
    # slot-major static views: v[j] is (C, T), w[j] is (1, T)
    v = [vals_ref[j] for j in range(8)]
    w = [w_ref[j] for j in range(8)]
    ac = [None] * 8
    ac_on = [None] * 8

    for pairs in _STAGES:
        for lo, hi in pairs:
            wl, wh = w[lo], w[hi]
            both = (wl > 0.0) & (wh > 0.0)
            only_hi = (wl <= 0.0) & (wh > 0.0)
            rs = jnp.sqrt(jnp.maximum(wl + wh, 1e-30))
            a = jnp.sqrt(jnp.maximum(wl, 0.0)) / rs
            b = jnp.sqrt(jnp.maximum(wh, 0.0)) / rs
            dc = a * v[lo] + b * v[hi]
            acv = -b * v[lo] + a * v[hi]
            v[lo] = jnp.where(both, dc, jnp.where(only_hi, v[hi], v[lo]))
            w[lo] = jnp.where(both, wl + wh,
                              jnp.where(only_hi, wh, wl))
            ac[hi] = jnp.where(both, acv, 0.0)
            ac_on[hi] = both

    zero_v = jnp.zeros_like(v[0])
    zero_m = jnp.zeros_like(w[0])
    for j in range(8):
        if j == 0:
            out_v_ref[0] = v[0]
            out_w_ref[0] = w[0]
            mask_ref[0] = zero_m
        else:
            out_v_ref[j] = ac[j] if ac[j] is not None else zero_v
            out_w_ref[j] = zero_m
            mask_ref[j] = (ac_on[j].astype(jnp.float32)
                           if ac_on[j] is not None else zero_m)


def fwd_blocks(vals: jnp.ndarray, weights: jnp.ndarray,
               interpret: bool = False):
    """(B,8,C) float32 values + (B,8) float32 weights ->
    (coeffs, wout, ac_mask).

    coeffs slot 0 = block DC (weight wout[:,0]); slots with
    ac_mask != 0 hold the block's AC coefficients in dyadic order.

    Traced with x64 disabled: the package enables jax_enable_x64
    globally (63-bit Morton codes), but 64-bit index types do not lower
    through the Mosaic TPU compiler; everything in this kernel is
    32-bit anyway.
    """
    with jax.enable_x64(False):
        return _fwd_blocks_jit(vals, weights, interpret)


@partial(jax.jit, static_argnames=("interpret",))
def _fwd_blocks_jit(vals: jnp.ndarray, weights: jnp.ndarray,
                    interpret: bool = False):
    b, _, c = vals.shape
    pad = (-b) % BLOCK_TILE
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
    bp = vals.shape[0]
    # slot-major, batch-last layout: (8, C, B) / (8, 1, B)
    v_t = jnp.transpose(vals, (1, 2, 0))
    w_t = jnp.transpose(weights, (1, 0))[:, None, :]
    grid = (bp // BLOCK_TILE,)
    out_v, out_w, ac_mask = pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, c, BLOCK_TILE), lambda i: (0, 0, i)),
            pl.BlockSpec((8, 1, BLOCK_TILE), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, c, BLOCK_TILE), lambda i: (0, 0, i)),
            pl.BlockSpec((8, 1, BLOCK_TILE), lambda i: (0, 0, i)),
            pl.BlockSpec((8, 1, BLOCK_TILE), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, c, bp), vals.dtype),
            jax.ShapeDtypeStruct((8, 1, bp), weights.dtype),
            jax.ShapeDtypeStruct((8, 1, bp), jnp.float32),
        ],
        interpret=interpret,
    )(v_t, w_t)
    coeffs = jnp.transpose(out_v, (2, 0, 1))[:b]
    wout = jnp.transpose(out_w[:, 0, :], (1, 0))[:b]
    mask = jnp.transpose(ac_mask[:, 0, :], (1, 0))[:b].astype(jnp.int32)
    return coeffs, wout, mask


def _inv_block_kernel(vals_ref, w_ref, out_v_ref):
    """Inverse block butterfly: slot 0 carries the block DC, upper
    slots the ACs (fwd layout); outputs the child values per slot.
    The per-stage pair weights replay the forward weight recursion."""
    v_in = [vals_ref[j] for j in range(8)]
    w = [w_ref[j] for j in range(8)]
    snaps = []
    for pairs in _STAGES:
        stage = []
        for lo, hi in pairs:
            wl, wh = w[lo], w[hi]
            stage.append((lo, hi, wl, wh))
            both = (wl > 0.0) & (wh > 0.0)
            only_hi = (wl <= 0.0) & (wh > 0.0)
            w[lo] = jnp.where(both, wl + wh,
                              jnp.where(only_hi, wh, wl))
        snaps.append(stage)
    v = [None] * 8
    v[0] = v_in[0]
    for stage in reversed(snaps):
        for lo, hi, wl, wh in stage:
            both = (wl > 0.0) & (wh > 0.0)
            only_hi = (wl <= 0.0) & (wh > 0.0)
            rs = jnp.sqrt(jnp.maximum(wl + wh, 1e-30))
            a = jnp.sqrt(jnp.maximum(wl, 0.0)) / rs
            b = jnp.sqrt(jnp.maximum(wh, 0.0)) / rs
            dc = v[lo]
            ac = v_in[hi]
            v1 = a * dc - b * ac
            v2 = b * dc + a * ac
            v[lo] = jnp.where(both, v1, dc)
            v[hi] = jnp.where(both, v2,
                              jnp.where(only_hi, dc, 0.0))
    for j in range(8):
        out_v_ref[j] = v[j]


def inv_blocks(coeffs: jnp.ndarray, weights: jnp.ndarray,
               interpret: bool = False):
    """Inverse of fwd_blocks: (B,8,C) coeffs (slot 0 DC + ACs) and the
    ORIGINAL per-slot child weights (B,8) -> (B,8,C) child values."""
    with jax.enable_x64(False):
        return _inv_blocks_jit(coeffs, weights, interpret)


@partial(jax.jit, static_argnames=("interpret",))
def _inv_blocks_jit(coeffs: jnp.ndarray, weights: jnp.ndarray,
                    interpret: bool = False):
    b, _, c = coeffs.shape
    pad = (-b) % BLOCK_TILE
    if pad:
        coeffs = jnp.pad(coeffs, ((0, pad), (0, 0), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
    bp = coeffs.shape[0]
    v_t = jnp.transpose(coeffs, (1, 2, 0))
    w_t = jnp.transpose(weights, (1, 0))[:, None, :]
    grid = (bp // BLOCK_TILE,)
    out_v = pl.pallas_call(
        _inv_block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, c, BLOCK_TILE), lambda i: (0, 0, i)),
            pl.BlockSpec((8, 1, BLOCK_TILE), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, c, BLOCK_TILE), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, c, bp), coeffs.dtype),
        ],
        interpret=interpret,
    )(v_t, w_t)[0]
    return jnp.transpose(out_v, (2, 0, 1))[:b]
