"""Octree geometry codec: vectorised analysis + batched entropy stage.

TPU-native counterpart of the reference's BFS octree coder
(`tmc3/geometry_octree_encoder.cpp:1853`, `geometry_octree_decoder.cpp:1559`).
The encoder derives the whole tree from sorted Morton codes in one
device pass (ops/octree.encode_analysis_jax, or the numpy mirror), then
serialises occupancy bytes level-by-level through the batched range coder
(one native call per level, contexts = 512-base x 255 tree).  The decoder
alternates: host entropy-decodes a level's occupancy bytes, a vectorised
pass expands children and computes the next level's context bases.

Duplicate points (when `geom_unique_points` is off) are carried as
per-leaf counts coded with a context ueg (reference leaf dup-count
coding, geometry_octree_encoder.cpp:2483-2513).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import entropy
from ..ops import octree as ops
from ..utils import morton

# dup-count ueg: 2 prefix contexts + escape; see entropy ueg layout
_DUP_PREFIX_MAX = 2
_DUP_K = 0
DUP_CTX_SIZE = _DUP_PREFIX_MAX + 8


@dataclass
class OctreeContexts:
    """Entropy context memories for the octree coder.

    Survives across slices/frames when entropy continuation is enabled
    (reference GeometryOctreeContexts, geometry_octree.h:841-912).
    """
    occupancy: np.ndarray = field(
        default_factory=lambda: entropy.new_contexts(ops.OCC_CTX_SIZE))
    dups: np.ndarray = field(
        default_factory=lambda: entropy.new_contexts(DUP_CTX_SIZE))

    def copy(self) -> "OctreeContexts":
        return OctreeContexts(self.occupancy.copy(), self.dups.copy())


def _dedup_sorted(codes_sorted: np.ndarray):
    """(unique_codes, dup_count_per_unique) of sorted codes."""
    if codes_sorted.size == 0:
        return codes_sorted, np.zeros(0, dtype=np.int64)
    keep = np.empty(codes_sorted.shape, dtype=bool)
    keep[0] = True
    np.not_equal(codes_sorted[1:], codes_sorted[:-1], out=keep[1:])
    uniq = codes_sorted[keep]
    counts = np.diff(np.append(np.nonzero(keep)[0], codes_sorted.size))
    return uniq, counts


def encode(positions: np.ndarray, depth: int, enc, ctx: OctreeContexts,
           unique_points: bool = True, use_device: bool = False):
    """Encode integer positions in [0, 2**depth)^3.

    Returns the permutation `order` mapping input points to coding
    (Morton+dup) order — attributes must be coded in this order so the
    decoder's point order matches (reference reorders points into
    decode order, geometry_octree_encoder.cpp:2637-2659).
    """
    codes = morton.encode(positions.astype(np.int64))
    order = np.argsort(codes, kind="stable")
    codes_sorted = codes[order]
    uniq, dup_counts = _dedup_sorted(codes_sorted)

    if depth == 0 or uniq.size == 0:
        pass
    elif use_device:
        import jax.numpy as jnp
        res = ops.encode_analysis_jax(jnp.asarray(uniq), depth)
        occ_a = np.asarray(res["occ"])
        base_a = np.asarray(res["ctx_base"])
        mask_a = np.asarray(res["node_mask"])
        for l in range(depth):
            m = mask_a[l]
            enc.occupancy(ctx.occupancy, base_a[l][m], occ_a[l][m])
    else:
        levels = ops.build_levels_np(uniq, depth)
        for lvl in levels:
            enc.occupancy(ctx.occupancy, lvl["ctx_base"], lvl["occ"])

    if not unique_points:
        enc.ueg(ctx.dups, np.zeros(dup_counts.size, dtype=np.int32),
                (dup_counts - 1).astype(np.uint32), _DUP_PREFIX_MAX, _DUP_K)
    return order


def decode(num_points: int, depth: int, dec, ctx: OctreeContexts,
           unique_points: bool = True):
    """Decode positions (coding order).

    num_points (total, incl. duplicates — signalled in the GBH) only
    gates the empty-slice case; the tree itself determines the count.
    """
    if num_points == 0:
        return np.zeros((0, 3), dtype=np.int64)
    nodes = np.zeros(1, dtype=np.int64)  # root
    for l in range(depth):
        base = ops.occ_context_base_np(nodes, l)
        occ = dec.occupancy(ctx.occupancy, base)
        nodes = ops.expand_level_np(nodes, occ)
    if not unique_points:
        dup = dec.ueg(ctx.dups, np.zeros(nodes.size, dtype=np.int32),
                      _DUP_PREFIX_MAX, _DUP_K).astype(np.int64) + 1
        nodes = np.repeat(nodes, dup)
    return morton.decode(nodes)
