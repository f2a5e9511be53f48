"""Octree geometry passes over Morton-sorted code tensors.

The reference codes geometry with an explicit breadth-first octree walk
(`tmc3/geometry_octree_encoder.cpp:1853-2660`: a ring buffer of nodes, a
per-node counting sort into 8 children, an occupancy atlas for neighbour
patterns).  Here the octree is *implicit*: the nodes of level ``l`` of a
depth-``d`` tree are the unique prefixes ``code >> 3*(d-l)`` of the sorted
leaf Morton codes.  Every per-node quantity becomes a vectorised pass:

* **child occupancy** (reference ``countingSort``,
  geometry_octree_encoder.cpp:2210): a segmented bit-OR over runs of equal
  prefixes,
* **neighbour pattern** (reference ``MortonMap3D`` occupancy atlas,
  OctreeNeighMap.cpp:171): binary search of the 6 face-neighbour codes in
  the sorted node-code array,
* **child expansion** (decoder): bit-unpack of the occupancy byte.

Context causality: the reference conditions a node's occupancy on
*already-coded same-level nodes* (BFS-causal).  We instead condition only
on information available once the **previous** level is decoded — the set
of nodes at this level and each node's position within its parent.  This
makes every level's context ids computable in one data-parallel pass on
both encoder and decoder (the decoder's only serial dependency is
level -> level), which is what lets the whole analysis run as a single
jitted program on TPU.

Two implementations, tested identical:
* numpy host path (reference semantics, compaction-friendly),
* jax device path (static shapes: full-depth encoder analysis in ONE jit,
  masks instead of compaction).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import morton

# 6 face neighbours, axis-major: -x,+x,-y,+y,-z,+z  (bit i of pattern).
_FACE_OFFSETS = np.array(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
    dtype=np.int64,
)

# Number of occupancy context "bases"; each base owns a 255-context
# binary tree for one 8-bit occupancy symbol (bitstream/entropy.py).
# Two context modes share one context memory (GPS neighbour flag):
#   NEIGH  (mode 1): base = 6-bit face pattern | child_idx << 6   (512)
#   PARENT (mode 0): base = child_idx << 8 | parent_occupancy    (2048)
# PARENT needs no lookups at all (the parent byte was just decoded) and
# is the fast/device default; NEIGH compresses ~4% better on sparse
# clouds at the price of 6 existence probes per node.
CTX_MODE_PARENT = 0
CTX_MODE_NEIGH = 1
NUM_OCC_BASES = 2048
OCC_CTX_SIZE = NUM_OCC_BASES * 255


# =====================================================================
# numpy host path
# =====================================================================


def unique_sorted(codes: np.ndarray) -> np.ndarray:
    """Unique of an already-sorted int array (keeps order)."""
    if codes.size == 0:
        return codes
    keep = np.empty(codes.shape, dtype=bool)
    keep[0] = True
    np.not_equal(codes[1:], codes[:-1], out=keep[1:])
    return codes[keep]


def level_occupancy_np(child_codes: np.ndarray):
    """Occupancy bytes of the parents of sorted unique child codes.

    Returns (parent_codes, occ_bytes): parents sorted unique, occ byte has
    bit ``child_code & 7`` set per present child (reference child index
    convention (x<<2)|(y<<1)|z, geometry_octree.h:88).
    """
    parents_all = child_codes >> 3
    keep = np.empty(parents_all.shape, dtype=bool)
    keep[0] = True
    np.not_equal(parents_all[1:], parents_all[:-1], out=keep[1:])
    parent_codes = parents_all[keep]
    seg = np.cumsum(keep) - 1
    bits = (1 << (child_codes & 7)).astype(np.int64)
    occ = np.zeros(parent_codes.shape[0], dtype=np.int64)
    # children are unique within a parent => add == or
    np.add.at(occ, seg, bits)
    return parent_codes, occ.astype(np.uint8)


def neighbor_pattern_np(node_codes: np.ndarray, level_dims: int) -> np.ndarray:
    """6-bit face-neighbour-existence pattern per node.

    ``node_codes``: sorted unique codes at this level; ``level_dims``:
    log2 of the level's grid size (node coordinates live in
    [0, 2**level_dims)).  Replaces the reference's occupancy-atlas lookup
    (OctreeNeighMap.cpp:171) with binary search over the sorted codes.
    """
    n = node_codes.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    pos = morton.decode(node_codes)  # (N,3)
    lim = np.int64(1) << np.int64(level_dims)
    pat = np.zeros(n, dtype=np.uint8)
    for i, off in enumerate(_FACE_OFFSETS):
        q = pos + off
        valid = np.all((q >= 0) & (q < lim), axis=-1)
        ncode = morton.encode(q)
        idx = np.searchsorted(node_codes, ncode)
        idx = np.minimum(idx, n - 1)
        hit = valid & (node_codes[idx] == ncode)
        pat |= (hit.astype(np.uint8) << i)
    return pat


def occ_context_base_np(node_codes: np.ndarray, level_dims: int) -> np.ndarray:
    """Context base per node for occupancy coding.

    base = neighbour pattern (64) | child-in-parent index << 6 (8), i.e.
    512 bases.  Both are decodable before this level's occupancy is read.
    """
    pat = neighbor_pattern_np(node_codes, level_dims).astype(np.int32)
    child_idx = (node_codes & 7).astype(np.int32)
    return pat | (child_idx << 6)


def expand_level_np(node_codes: np.ndarray, occ: np.ndarray) -> np.ndarray:
    """Child codes (sorted unique) from node codes + occupancy bytes."""
    bits = (occ[:, None] >> np.arange(8, dtype=np.uint8)) & 1  # (N,8)
    child = (node_codes[:, None] << 3) | np.arange(8, dtype=np.int64)
    return child[bits.astype(bool)]


def pred_occupancy_np(node_codes: np.ndarray, ref_child_codes: np.ndarray
                      ) -> np.ndarray:
    """Inter prediction: occupancy byte of each node in the
    motion-compensated reference frame (reference predOccupancy
    contextualisation, geometry_octree_encoder.cpp:1875-1918).

    node_codes: level-l nodes; ref_child_codes: sorted unique reference
    codes at level l+1.  pred bit j set iff the reference occupies
    child j of the node.
    """
    m = node_codes.shape[0]
    if m == 0 or ref_child_codes.size == 0:
        return np.zeros(m, dtype=np.int32)
    queries = (node_codes[:, None] << 3) | np.arange(8, dtype=np.int64)
    idx = np.searchsorted(ref_child_codes, queries)
    idx = np.minimum(idx, ref_child_codes.size - 1)
    hit = ref_child_codes[idx] == queries
    return np.sum(
        hit.astype(np.int32) << np.arange(8, dtype=np.int32)[None, :],
        axis=1)


def popcount8_np(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.astype(np.uint8)[:, None],
                         axis=1).sum(axis=1).astype(np.int64)


def build_levels_np(leaf_codes_unique: np.ndarray, depth: int,
                    mode: int = CTX_MODE_NEIGH):
    """Encoder-side analysis: per level, (node_codes, occ, ctx_base).

    Level l has grid size 2**l per axis; level `depth` is the leaves.
    Returns list over l = 0..depth-1 of dicts; entry l describes the
    nodes at level l and the occupancy bytes that generate level l+1.
    """
    codes_by_level = [None] * (depth + 1)
    codes_by_level[depth] = leaf_codes_unique
    occs = [None] * depth
    for l in range(depth - 1, -1, -1):
        codes_by_level[l], occs[l] = level_occupancy_np(codes_by_level[l + 1])
    out = []
    for l in range(depth):
        nodes = codes_by_level[l]
        if mode == CTX_MODE_NEIGH:
            base = occ_context_base_np(nodes, l)
        else:
            child = (nodes & 7).astype(np.int32)
            if l == 0:
                parent_occ = np.zeros(1, dtype=np.int32)
            else:
                prev = occs[l - 1]
                parent_occ = np.repeat(
                    prev.astype(np.int32), popcount8_np(prev))
            base = (child << 8) | parent_occ
        out.append({"nodes": nodes, "occ": occs[l], "ctx_base": base})
    return out


# =====================================================================
# jax device path (static shapes; one jit for full encoder analysis)
# =====================================================================


def _searchsorted_exists(sorted_full: jnp.ndarray, queries: jnp.ndarray,
                         valid: jnp.ndarray) -> jnp.ndarray:
    """Existence of `queries` in `sorted_full` (sorted, may contain dups
    and +inf padding)."""
    n = sorted_full.shape[0]
    idx = jnp.searchsorted(sorted_full, queries)
    idx = jnp.minimum(idx, n - 1)
    return valid & (sorted_full[idx] == queries)


_I64_MAX = np.iinfo(np.int64).max


@partial(jax.jit, static_argnames=("depth", "mode"))
def encode_analysis_jax(leaf_codes_sorted: jnp.ndarray, depth: int,
                        mode: int = CTX_MODE_NEIGH):
    """Full-depth encoder analysis in one jitted program.

    Input: (N,) sorted leaf Morton codes (duplicates allowed — they
    collapse at the leaf level).  Output: dict of stacked per-level
    tensors, each (depth, N), masked by `node_mask`:

      node_mask[l, i] — True where row i is the first point of a level-l
                        node (i.e. a real node slot),
      occ[l, i]       — that node's occupancy byte,
      ctx_base[l, i]  — its occupancy-context base,
      node_code[l, i] — its level-l code (garbage where ~mask).

    Host compacts with the mask and feeds the entropy stage level by
    level.  The level loop is a lax.fori_loop — one compiled body for
    all levels (unrolling depth x ~40 ops bloats compile time and the
    kernel count, which dominates when the chip is dispatch-latency
    bound).
    """
    c = leaf_codes_sorted
    n = c.shape[0]
    depth_i = jnp.int64(depth)
    offsets = jnp.asarray(_FACE_OFFSETS)          # (6,3)

    def body(l, carry):
        occ_out, base_out, mask_out, code_out, prev_occ_rows = carry
        shift_node = 3 * (depth_i - l)
        cl = c >> shift_node                      # level-l code per point
        first = jnp.concatenate(
            [jnp.ones((1,), bool), cl[1:] != cl[:-1]])
        seg = jnp.cumsum(first) - 1               # node id per point
        child = (c >> (shift_node - 3)) & 7
        onehot = jax.nn.one_hot(child, 8, dtype=jnp.int32)
        occ_counts = jax.ops.segment_sum(onehot, seg, num_segments=n)
        occ = (jnp.sum(
            jnp.where(occ_counts > 0, 1, 0)
            * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=-1)
        ).astype(jnp.int32)                       # dense over node ids
        occ_rows = occ[seg]                       # per-point node occ

        if mode == CTX_MODE_NEIGH:
            pos = morton.decode(cl, xp=jnp)       # (N,3)
            lim = jnp.int64(1) << l
            q = pos[:, None, :] + offsets[None, :, :]      # (N,6,3)
            valid = jnp.all((q >= 0) & (q < lim), axis=-1)  # (N,6)
            ncode = morton.encode(q, xp=jnp)                # (N,6)
            idx = jnp.searchsorted(cl, ncode.reshape(-1))
            idx = jnp.minimum(idx, n - 1).reshape(n, 6)
            hit = valid & (cl[idx] == ncode)
            pat = jnp.sum(
                hit.astype(jnp.int32)
                * (1 << jnp.arange(6, dtype=jnp.int32))[None, :], axis=1)
            base = (pat | ((cl & 7).astype(jnp.int32) << 6)
                    ).astype(jnp.int32)
        else:
            base = ((((cl & 7).astype(jnp.int32)) << 8)
                    | prev_occ_rows).astype(jnp.int32)

        occ_out = occ_out.at[l].set(jnp.where(first, occ_rows, 0))
        base_out = base_out.at[l].set(jnp.where(first, base, 0))
        mask_out = mask_out.at[l].set(first)
        code_out = code_out.at[l].set(cl)
        return (occ_out, base_out, mask_out, code_out, occ_rows)

    init = (jnp.zeros((depth, n), jnp.int32),
            jnp.zeros((depth, n), jnp.int32),
            jnp.zeros((depth, n), bool),
            jnp.zeros((depth, n), jnp.int64),
            jnp.zeros(n, jnp.int32))
    occ_out, base_out, mask_out, code_out, _ = jax.lax.fori_loop(
        0, depth, body, init)
    return {
        "occ": occ_out,
        "ctx_base": base_out,
        "node_mask": mask_out,
        "node_code": code_out,
    }


@partial(jax.jit, static_argnames=("depth",))
def encode_analysis_inter_jax(leaf_codes_sorted: jnp.ndarray, depth: int,
                              ref_codes_sorted: jnp.ndarray,
                              ref_count: jnp.ndarray):
    """Inter-frame encoder analysis: per-level occupancy + predOcc
    contexts from a motion-compensated reference (the device form of
    pred_occupancy_np; reference predOccupancy contextualisation,
    geometry_octree_encoder.cpp:1875-1918).

    ref_codes_sorted: (M,) sorted reference leaf codes, padded past
    ref_count with INT64_MAX so padded slots never match.  Output
    layout matches encode_analysis_jax with ctx_base =
    (child_octant << 8) | pred_byte.
    """
    c = leaf_codes_sorted
    r = ref_codes_sorted
    n = c.shape[0]
    m = r.shape[0]
    depth_i = jnp.int64(depth)

    def body(l, carry):
        occ_out, base_out, mask_out, code_out = carry
        shift_node = 3 * (depth_i - l)
        cl = c >> shift_node
        first = jnp.concatenate(
            [jnp.ones((1,), bool), cl[1:] != cl[:-1]])
        seg = jnp.cumsum(first) - 1
        child = (c >> (shift_node - 3)) & 7
        onehot = jax.nn.one_hot(child, 8, dtype=jnp.int32)
        occ_counts = jax.ops.segment_sum(onehot, seg, num_segments=n)
        occ = (jnp.sum(
            jnp.where(occ_counts > 0, 1, 0)
            * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=-1)
        ).astype(jnp.int32)
        occ_rows = occ[seg]

        # reference children at level l+1 (monotone shift keeps order)
        rl = r >> (shift_node - 3)
        queries = (cl[:, None] << 3) | jnp.arange(8, dtype=jnp.int64)
        idx = jnp.searchsorted(rl, queries.reshape(-1))
        idx = jnp.minimum(idx, m - 1)
        hit = ((rl[idx] == queries.reshape(-1))
               & (idx < ref_count)).reshape(n, 8)
        pred = jnp.sum(
            hit.astype(jnp.int32)
            * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=1)
        base = ((((cl & 7).astype(jnp.int32)) << 8) | pred)

        occ_out = occ_out.at[l].set(jnp.where(first, occ_rows, 0))
        base_out = base_out.at[l].set(jnp.where(first, base, 0))
        mask_out = mask_out.at[l].set(first)
        code_out = code_out.at[l].set(cl)
        return (occ_out, base_out, mask_out, code_out)

    init = (jnp.zeros((depth, n), jnp.int32),
            jnp.zeros((depth, n), jnp.int32),
            jnp.zeros((depth, n), bool),
            jnp.zeros((depth, n), jnp.int64))
    occ_out, base_out, mask_out, code_out = jax.lax.fori_loop(
        0, depth, body, init)
    return {
        "occ": occ_out,
        "ctx_base": base_out,
        "node_mask": mask_out,
        "node_code": code_out,
    }


@partial(jax.jit, static_argnames=("depth", "mode"))
def encode_analysis_packed(leaf_codes_sorted: jnp.ndarray, depth: int,
                           mode: int = CTX_MODE_NEIGH):
    """Full-depth analysis with ON-DEVICE compaction.

    Same math as encode_analysis_jax, but the per-level (ctx_base, occ)
    pairs are packed into one int32 (base << 8 | occ) and compacted so
    the host transfers only ~#nodes * 4 bytes instead of O(depth * N)
    full tensors — the dominant cost when the chip sits behind a
    narrow host link.  Returns (compact, counts):

      compact : (depth * N,) int32 — valid entries first, in
                (level, node) order; only the first sum(counts) matter,
      counts  : (depth,) int32 — number of nodes per level.
    """
    res = encode_analysis_jax(leaf_codes_sorted, depth, mode)
    occ = res["occ"]
    base = res["ctx_base"]
    mask = res["node_mask"]
    packed = (base << 8) | occ                    # <= 19 bits
    flat = packed.reshape(-1)
    valid = mask.reshape(-1)
    # stable sort by ~valid keeps (level, row) order among valid rows
    perm = jnp.argsort(jnp.logical_not(valid), stable=True)
    compact = flat[perm].astype(jnp.int32)
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)
    return compact, counts


@partial(jax.jit, static_argnames=("depth", "cap"))
def encode_occ_u8(leaf_codes_sorted: jnp.ndarray, depth: int, cap: int):
    """Occupancy-only encoder analysis with tight on-device packing.

    The production device pipeline ships ONLY the per-level occupancy
    bytes to the host — 1 byte per tree node instead of the 4-byte
    (ctx|occ) packing — because the PARENT-mode context base of every
    node is derivable from earlier bytes of the same stream (the host
    entropy stage does that in native code, entropy.cc rce_occ_stream).
    This keeps the host link traffic at its information-theoretic floor
    for the wavefront split (SURVEY.md §7.3).

    Input: (N,) sorted leaf Morton codes (duplicates allowed).
    Returns (occ_u8 (cap,), counts (depth,) int32): level-major
    occupancy bytes, valid entries first; only the first sum(counts)
    bytes matter.  cap must be >= the total node count (caller sizes it
    ~2.5*N and retries larger on overflow; counts.sum() tells).
    """
    c = leaf_codes_sorted
    n = c.shape[0]
    depth_i = jnp.int64(depth)

    def body(l, carry):
        occ_out, mask_out = carry
        shift_node = 3 * (depth_i - l)
        cl = c >> shift_node
        first = jnp.concatenate(
            [jnp.ones((1,), bool), cl[1:] != cl[:-1]])
        seg = jnp.cumsum(first) - 1
        child = (c >> (shift_node - 3)) & 7
        onehot = jax.nn.one_hot(child, 8, dtype=jnp.int32)
        occ_counts = jax.ops.segment_sum(onehot, seg, num_segments=n)
        occ = (jnp.sum(
            jnp.where(occ_counts > 0, 1, 0)
            * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=-1)
        ).astype(jnp.int32)
        occ_rows = occ[seg]
        occ_out = occ_out.at[l].set(jnp.where(first, occ_rows, 0))
        mask_out = mask_out.at[l].set(first)
        return occ_out, mask_out

    init = (jnp.zeros((depth, n), jnp.int32),
            jnp.zeros((depth, n), bool))
    occ_out, mask_out = jax.lax.fori_loop(0, depth, body, init)
    flat = occ_out.reshape(-1)
    valid = mask_out.reshape(-1)
    # gather-based stream compaction: position of the i-th valid row
    # by binary search on the inclusive cumsum (sorts and scatters are
    # the two ops XLA:TPU serialises; cumsum + searchsorted + gather
    # all tile onto the vector unit)
    k = min(cap, depth * n)
    cums = jnp.cumsum(valid.astype(jnp.int32))
    idx = jnp.searchsorted(cums, jnp.arange(1, k + 1, dtype=jnp.int32))
    idx = jnp.minimum(idx, depth * n - 1)
    compact = flat[idx].astype(jnp.uint8)
    if k < cap:
        compact = jnp.pad(compact, (0, cap - k))
    counts = jnp.sum(mask_out, axis=1).astype(jnp.int32)
    return compact, counts


def _occ_code_tables():
    """(lens (256,) int32, rev_codes (256,) int64) of the static link
    code, read from the native library (the single source of truth,
    native/occ_code.inc).  Codes are bit-reversed for LSB-first
    emission into little-endian uint32 words."""
    if not hasattr(_occ_code_tables, "_cache"):
        import ctypes as _ct

        from ..bitstream import entropy as _ent
        lens = np.zeros(256, dtype=np.uint8)
        codes = np.zeros(256, dtype=np.uint16)
        _ent._LIB.occ_huff_table(
            lens.ctypes.data_as(_ct.POINTER(_ct.c_uint8)),
            codes.ctypes.data_as(_ct.POINTER(_ct.c_uint16)))
        rev = np.zeros(256, dtype=np.int64)
        for s in range(256):
            ln, c = int(lens[s]), int(codes[s])
            r = 0
            for b in range(ln):
                r |= ((c >> (ln - 1 - b)) & 1) << b
            rev[s] = r
        _occ_code_tables._cache = (lens.astype(np.int32), rev)
    return _occ_code_tables._cache


@partial(jax.jit, static_argnames=("depth", "cap", "cap_packed"))
def encode_occ_packed_hdr(leaf_codes_sorted: jnp.ndarray, depth: int,
                          cap: int, cap_packed: int):
    """encode_occ_u8 + on-device link compression.

    The level-major occupancy bytes are emitted through the static
    canonical prefix code (native/occ_code.inc, ~4.6 bits/byte) packed
    LSB-first into little-endian uint32 words — a fully vectorised
    variable-length bit packer: per-symbol bit offsets by cumsum, each
    code scattered as (lo, hi) word contributions whose bits are
    disjoint, so scatter-ADD is scatter-OR.  This narrows the
    device->host link toward the occupancy entropy; the host unpacks
    natively (entropy.cc occ_unpack) before the adaptive range coder.

    Returns a (4*depth + 4 + cap_packed,) uint8 buffer:
    [depth uint32 node counts | uint32 total_bits | packed bits].
    If total_bits > 8*cap_packed - 24 the packed region is invalid
    (unpacker overreads 2 bytes) and the caller must fall back to the
    raw path for this slice.
    """
    lens_np, rev_np = _occ_code_tables()
    compact, counts = encode_occ_u8(leaf_codes_sorted, depth, cap)
    total = jnp.sum(counts)
    idx = jnp.arange(cap)
    mask = idx < total
    sym = compact.astype(jnp.int32)
    lens = jnp.where(mask, jnp.asarray(lens_np)[sym], 0)
    offs = jnp.cumsum(lens) - lens
    rev = jnp.where(mask, jnp.asarray(rev_np)[sym], 0)
    word = offs >> 5
    bit = (offs & 31).astype(jnp.int64)
    lo = (rev << bit) & 0xFFFFFFFF
    hi = rev >> (32 - bit)
    nwords = cap_packed // 4
    # word indices are monotone (offs is a cumsum), so the two
    # scatter-ORs are sorted segment reductions — the form XLA:TPU
    # vectorises (an unsorted scatter serialises)
    acc = jax.ops.segment_sum(lo, word, num_segments=nwords + 1,
                              indices_are_sorted=True)
    acc = acc + jax.ops.segment_sum(hi, word + 1,
                                    num_segments=nwords + 1,
                                    indices_are_sorted=True)
    words = acc[:nwords].astype(jnp.uint32)
    total_bits = jnp.sum(lens).astype(jnp.uint32)
    sh = jnp.asarray([0, 8, 16, 24], jnp.uint32)
    cnt_u8 = jax.lax.shift_right_logical(
        counts[:, None].astype(jnp.uint32), sh[None, :],
    ).astype(jnp.uint8).reshape(-1)
    tb_u8 = jax.lax.shift_right_logical(
        total_bits[None, None], sh[None, :]).astype(jnp.uint8).reshape(-1)
    pk_u8 = jax.lax.shift_right_logical(
        words[:, None], sh[None, :]).astype(jnp.uint8).reshape(-1)
    return jnp.concatenate([cnt_u8, tb_u8, pk_u8])


@partial(jax.jit, static_argnames=("depth", "cap"))
def encode_occ_u8_hdr(leaf_codes_sorted: jnp.ndarray, depth: int,
                      cap: int):
    """encode_occ_u8 with the per-level counts packed into the buffer
    head, so the host needs ONE fixed-shape fetch per slice (each
    device->host round trip costs ~ms through a narrow host link).

    Returns a (4*depth + cap,) uint8 array: depth little-endian uint32
    node counts, then the level-major occupancy bytes."""
    compact, counts = encode_occ_u8(leaf_codes_sorted, depth, cap)
    cnt_u8 = jax.lax.shift_right_logical(
        counts[:, None].astype(jnp.uint32),
        jnp.asarray([0, 8, 16, 24], jnp.uint32)[None, :],
    ).astype(jnp.uint8).reshape(-1)
    return jnp.concatenate([cnt_u8, compact])


@partial(jax.jit, static_argnames=("depth", "nmax"))
def decode_expand_stream(occ_u8: jnp.ndarray, counts: jnp.ndarray,
                         depth: int, nmax: int):
    """Decoder expansion straight from the packed level-major occupancy
    byte stream (the exact layout the host entropy stage produces, so
    no per-level host reshaping touches the h2d path).

    occ_u8: (cap,) uint8 level-major occupancy bytes (padding past
    sum(counts) ignored); counts: (depth,) int32 per-level node counts.
    nmax: static leaf capacity.  Returns (codes (nmax,) int64 padded
    with I64_MAX, leaf_count).
    """
    cap = occ_u8.shape[0]
    offs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]).astype(jnp.int32)
    slots = jnp.arange(8, dtype=jnp.int64)
    row = jnp.arange(nmax)

    def body(l, carry):
        nodes, cnt = carry
        idx = jnp.minimum(offs[l] + row, cap - 1)
        occ = jnp.where(row < counts[l], occ_u8[idx], 0).astype(jnp.int64)
        m = (((occ[:, None] >> slots[None, :]) & 1) > 0) \
            & (row < cnt)[:, None]
        child = (nodes[:, None] << 3) | slots[None, :]
        flat_m = m.reshape(-1)
        flat_c = child.reshape(-1)
        # gather-based compaction (see encode_occ_u8): i-th set bit
        # found by searchsorted on the inclusive cumsum
        cums = jnp.cumsum(flat_m.astype(jnp.int32))
        src = jnp.searchsorted(cums,
                               jnp.arange(1, nmax + 1, dtype=jnp.int32))
        src = jnp.minimum(src, 8 * nmax - 1)
        new_cnt = cums[-1].astype(jnp.int64)
        out = jnp.where(row < new_cnt, flat_c[src], _I64_MAX)
        return out, new_cnt

    nodes0 = jnp.full(nmax, _I64_MAX, dtype=jnp.int64)
    nodes0 = nodes0.at[0].set(0)
    nodes, cnt = jax.lax.fori_loop(0, depth, body,
                                   (nodes0, jnp.int64(1)))
    return nodes, cnt


@partial(jax.jit, static_argnames=("level_dims",))
def decode_level_jax(node_codes: jnp.ndarray, valid: jnp.ndarray,
                     level_dims: int):
    """Decoder-side context pass for one level (padded static shape).

    node_codes: (N,) sorted level codes, padded with INT64_MAX where
    ~valid.  Returns ctx_base (N,) int32 (garbage where ~valid).
    """
    n = node_codes.shape[0]
    pos = morton.decode(node_codes, xp=jnp)
    lim = jnp.int64(1) << level_dims
    pat = jnp.zeros(n, dtype=jnp.int32)
    for i, off in enumerate(_FACE_OFFSETS):
        q = pos + jnp.asarray(off)[None, :]
        ok = valid & jnp.all((q >= 0) & (q < lim), axis=-1)
        ncode = morton.encode(q, xp=jnp)
        hit = _searchsorted_exists(node_codes, ncode, ok)
        pat = pat | (hit.astype(jnp.int32) << i)
    child_idx = (node_codes & 7).astype(jnp.int32)
    return pat | (child_idx << 6)


@partial(jax.jit, static_argnames=("depth",))
def decode_expand_jax(occ_levels: jnp.ndarray, counts: jnp.ndarray,
                      depth: int):
    """Full-depth decoder expansion in one jitted program.

    The TPU-first decode pipeline splits the decoder like the encoder:
    the (serial) entropy stage runs on the host and produces only the
    occupancy bytes — ~1 byte per tree node — and this kernel turns
    them into leaf codes entirely on device, where they can feed the
    device RAHT stage without ever materialising positions on the
    host (reference decoder walks a ringbuffer per node,
    geometry_octree_decoder.cpp).

    occ_levels: (depth, N) int32 occupancy bytes per level, row l
    padded past counts[l]; N = leaf capacity.  Returns (codes (N,)
    int64 padded with I64_MAX, leaf_count).
    """
    n = occ_levels.shape[1]
    slots = jnp.arange(8, dtype=jnp.int64)
    row = jnp.arange(n)

    def body(l, carry):
        nodes, cnt = carry
        occ = occ_levels[l].astype(jnp.int64)
        m = (((occ[:, None] >> slots[None, :]) & 1) > 0) \
            & (row < cnt)[:, None]
        child = (nodes[:, None] << 3) | slots[None, :]
        flat_m = m.reshape(-1)
        flat_c = child.reshape(-1)
        pos = jnp.cumsum(flat_m) - 1
        dest = jnp.where(flat_m, pos, n)     # n = discard slot
        out = jnp.full(n + 1, _I64_MAX, dtype=jnp.int64)
        out = out.at[dest].set(flat_c, mode="drop")
        return out[:n], flat_m.sum()

    # occupancy bit k corresponds to child octant (7 - k)? No: the
    # encoder's occupancy bit b is set when child (code<<3 | b) exists
    # (level_occupancy_np), so slots map 1:1.
    nodes0 = jnp.full(n, _I64_MAX, dtype=jnp.int64)
    nodes0 = nodes0.at[0].set(0)
    nodes, cnt = jax.lax.fori_loop(0, depth, body,
                                   (nodes0, jnp.int64(1)))
    return nodes, cnt
