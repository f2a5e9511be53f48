"""Device-side RAHT forward transform: XLA gathers + Pallas butterflies.

The TPU form of ops/raht.py's forward(): the host derives the per-level
block structure from the sorted Morton codes (pure indexing, cheap),
the device gathers each octree level's occupied 2x2x2 blocks into dense
(B, 8, C) tensors and runs the Pallas block-butterfly kernel
(ops/pallas_raht.py) level by level, bottom-up.  DCs (slot 0 of each
block) become the next level's values; ACs are the transform
coefficients.

Coefficient values are identical to the numpy sweeps (same butterflies,
same weights — verified in tests); only the serialisation order
differs (block-major here vs sweep-row-major), so a codec using this
path pairs it with the matching device decoder (round 2).
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from . import pallas_raht


def build_block_plan(leaf_codes: np.ndarray, depth: int):
    """Host: per octree level, the block gather plan.

    Returns list over levels (fine -> coarse) of dicts:
      gather  (B, 8) int32 — index into the level's node array per
              slot, -1 for empty slots,
      parent_codes (B,)   — the block's parent node codes (sorted).
    """
    plan = []
    codes = leaf_codes.astype(np.int64)
    for l in range(depth):
        parent = codes >> 3
        slot = (codes & 7).astype(np.int64)
        first = np.concatenate([[True], parent[1:] != parent[:-1]])
        block_of = np.cumsum(first) - 1
        nblocks = int(block_of[-1]) + 1 if codes.size else 0
        gather = np.full((nblocks, 8), -1, dtype=np.int32)
        gather[block_of, slot] = np.arange(codes.size, dtype=np.int32)
        parent_codes = parent[first]
        plan.append({"gather": gather, "parent_codes": parent_codes})
        codes = parent_codes
    return plan


def stage_plan(leaf_codes: np.ndarray, depth: int):
    """Upload the block gather plan once (production keeps it resident
    next to the geometry); forward_device(staged=...) then runs
    transfer-free."""
    plan = build_block_plan(leaf_codes, depth)
    return [jnp.asarray(p["gather"]) for p in plan]


def forward_device(leaf_codes: np.ndarray, values: np.ndarray,
                   depth: int, interpret: bool = False, staged=None):
    """Full bottom-up RAHT on device.

    Returns (acs_per_level, root_dc) — acs_per_level[l] is a
    (B_l, 8, C) float32 array where non-DC occupied slots hold the
    level's AC coefficients (slot 0 and empty slots are zero), plus the
    per-level weight layout for identifying them.
    """
    gathers = staged if staged is not None else stage_plan(
        leaf_codes, depth)
    vals = jnp.asarray(values, dtype=jnp.float32)
    if vals.ndim == 1:
        vals = vals[:, None]
    w = jnp.ones((vals.shape[0],), jnp.float32)
    acs_out: List = []
    for l in range(depth):
        g = gathers[l]
        occ = g >= 0
        gi = jnp.where(occ, g, 0)
        blk_v = jnp.where(occ[..., None], vals[gi], 0.0)   # (B,8,C)
        blk_w = jnp.where(occ, w[gi], 0.0)                 # (B,8)
        coeffs, wout, ac_mask = pallas_raht.fwd_blocks(
            blk_v, blk_w, interpret=interpret)
        acs_out.append((coeffs, ac_mask))
        # next level: the block DC collapses to slot 0
        vals = coeffs[:, 0, :]
        w = wout[:, 0]
    return acs_out, vals


def inverse_device(leaf_codes: np.ndarray, acs_per_level,
                   root_vals, depth: int, interpret: bool = False,
                   staged=None):
    """Device-side inverse RAHT: top-down block un-butterflies.

    acs_per_level: forward_device's per-level (coeffs, ac_mask) —
    slot 0 of each block may be overridden by the running
    reconstruction (closed-loop decode: pass dequantised ACs in the
    same layout).  Returns the (N, C) leaf values.
    """
    gathers = staged if staged is not None else stage_plan(
        leaf_codes, depth)
    # upward weight pass (geometry-derived; cheap elementwise)
    n = leaf_codes.shape[0]
    w = jnp.ones((n,), jnp.float32)
    blk_ws: List = []
    for l in range(depth):
        g = gathers[l]
        occ = g >= 0
        gi = jnp.where(occ, g, 0)
        blk_w = jnp.where(occ, w[gi], 0.0)
        blk_ws.append(blk_w)
        w = blk_w.sum(axis=1)
    vals = jnp.asarray(root_vals, dtype=jnp.float32)
    if vals.ndim == 1:
        vals = vals[:, None]
    for l in range(depth - 1, -1, -1):
        coeffs = acs_per_level[l][0]
        blk = coeffs.at[:, 0, :].set(vals)
        child = pallas_raht.inv_blocks(blk, blk_ws[l],
                                       interpret=interpret)
        g = gathers[l]
        occ = g >= 0
        gi = jnp.where(occ, g, 0)
        nl = int(g.max()) + 1 if g.size else 0
        flat = jnp.zeros((nl, child.shape[-1]), jnp.float32)
        # scatter-add: empty slots contribute zero to row 0 instead of
        # clobbering a real row
        flat = flat.at[jnp.where(occ, g, 0)].add(
            jnp.where(occ[..., None], child, 0.0))
        vals = flat
    return vals
