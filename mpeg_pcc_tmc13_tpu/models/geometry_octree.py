"""Octree geometry codec: vectorised analysis + batched entropy stage.

TPU-native counterpart of the reference's BFS octree coder
(`tmc3/geometry_octree_encoder.cpp:1853`, `geometry_octree_decoder.cpp:1559`).
The encoder derives the whole tree from sorted Morton codes, then
serialises occupancy bytes level-by-level through the batched range
coder; the decoder alternates entropy decode / vectorised expansion.

Three interchangeable engines emit byte-identical streams:
  "numpy"  — host mirror (executable spec),
  "native" — one C++ call for the whole tree (native/octree.cc); the
             fast path on a single host core,
  "device" — jitted full-depth analysis on the TPU (ops/octree.py),
             compacted on device so the host link carries only ~4
             bytes/node; the scale-out path (parallel/slices.py).

Context modes (GPS `neighbour_context_enabled`): see ops/octree.py
CTX_MODE_NEIGH / CTX_MODE_PARENT.

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
    # inter bricks: base = child_idx << 8 | reference pred-occupancy
    occupancy_inter: np.ndarray = field(
        default_factory=lambda: entropy.new_contexts(ops.OCC_CTX_SIZE))

    def copy(self) -> "OctreeContexts":
        return OctreeContexts(self.occupancy.copy(), self.dups.copy(),
                              self.occupancy_inter.copy())


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


def resolve_engine(engine: str) -> str:
    if engine != "auto":
        return engine
    return "native" if entropy.native_available() else "numpy"


def encode(positions: np.ndarray, depth: int, enc, ctx: OctreeContexts,
           unique_points: bool = True, engine: str = "auto",
           ctx_mode: int = ops.CTX_MODE_NEIGH,
           ref_codes: np.ndarray = None):
    """Encode integer positions in [0, 2**depth)^3.

    ref_codes: sorted unique Morton codes of the motion-compensated
    reference frame (slice-local) — enables inter occupancy contexts.

    Returns the permutation `order` mapping input points to coding
    (Morton+dup) order — attributes must be coded in this order so the
    decoder's point order matches (reference reorders points into
    decode order, geometry_octree_encoder.cpp:2637-2659).
    """
    engine = resolve_engine(engine)
    codes = morton.encode(positions.astype(np.int64))
    if engine == "native":
        codes_sorted, order = entropy.radix_sort(codes)
    else:
        order = np.argsort(codes, kind="stable")
        codes_sorted = codes[order]
    uniq, dup_counts = _dedup_sorted(codes_sorted)

    if depth == 0 or uniq.size == 0:
        pass
    elif ref_codes is not None and ref_codes.size:
        # inter brick (numpy path; contexts keyed by reference occ)
        levels = ops.build_levels_np(uniq, depth, ops.CTX_MODE_PARENT)
        for l, lvl in enumerate(levels):
            ref_l1 = np.unique(ref_codes >> (3 * (depth - l - 1)))
            pred = ops.pred_occupancy_np(lvl["nodes"], ref_l1)
            base = ((lvl["nodes"] & 7).astype(np.int32) << 8) | pred
            enc.occupancy(ctx.occupancy_inter, base, lvl["occ"])
    elif engine == "native" and hasattr(enc, "octree"):
        enc.octree(ctx.occupancy, uniq, depth, ctx_mode)
    elif engine == "device":
        import jax.numpy as jnp
        compact, counts = ops.encode_analysis_packed(
            jnp.asarray(uniq), depth, ctx_mode)
        counts = np.asarray(counts)
        total = int(counts.sum())
        # single small transfer: 4 bytes per tree node
        packed = np.asarray(compact[:total])
        off = 0
        for l in range(depth):
            k = int(counts[l])
            lvl = packed[off:off + k]
            off += k
            enc.occupancy(ctx.occupancy, lvl >> 8, lvl & 0xFF)
    else:
        levels = ops.build_levels_np(uniq, depth, ctx_mode)
        for lvl in levels:
            enc.occupancy(ctx.occupancy, lvl["ctx_base"], lvl["occ"])

    if not unique_points:
        enc.ueg(ctx.dups, np.zeros(dup_counts.size, dtype=np.int32),
                (dup_counts - 1).astype(np.uint32), _DUP_PREFIX_MAX, _DUP_K)
    return order


def decode(num_points: int, depth: int, dec, ctx: OctreeContexts,
           unique_points: bool = True, engine: str = "auto",
           ctx_mode: int = ops.CTX_MODE_NEIGH,
           ref_codes: np.ndarray = None):
    """Decode positions (coding order).

    num_points (total, incl. duplicates — signalled in the GBH) only
    gates the empty-slice case and bounds the leaf count.
    """
    if num_points == 0:
        return np.zeros((0, 3), dtype=np.int64)
    engine = resolve_engine(engine)
    if ref_codes is not None and ref_codes.size:
        nodes = np.zeros(1, dtype=np.int64)  # root
        for l in range(depth):
            ref_l1 = np.unique(ref_codes >> (3 * (depth - l - 1)))
            pred = ops.pred_occupancy_np(nodes, ref_l1)
            base = ((nodes & 7).astype(np.int32) << 8) | pred
            occ = dec.occupancy(ctx.occupancy_inter, base)
            nodes = ops.expand_level_np(nodes, occ)
    elif engine == "native" and hasattr(dec, "octree") and depth > 0:
        nodes = dec.octree(ctx.occupancy, num_points, depth, ctx_mode)
    else:
        nodes = np.zeros(1, dtype=np.int64)  # root
        parent_occ = np.zeros(1, dtype=np.int32)
        for l in range(depth):
            if ctx_mode == ops.CTX_MODE_NEIGH:
                base = ops.occ_context_base_np(nodes, l)
            else:
                base = ((nodes & 7).astype(np.int32) << 8) | parent_occ
            occ = dec.occupancy(ctx.occupancy, base)
            nodes = ops.expand_level_np(nodes, occ)
            if ctx_mode == ops.CTX_MODE_PARENT:
                parent_occ = np.repeat(
                    occ.astype(np.int32), ops.popcount8_np(occ))
    if not unique_points:
        dup = dec.ueg(ctx.dups, np.zeros(nodes.size, dtype=np.int32),
                      _DUP_PREFIX_MAX, _DUP_K).astype(np.int64) + 1
        nodes = np.repeat(nodes, dup)
    return morton.decode(nodes)
