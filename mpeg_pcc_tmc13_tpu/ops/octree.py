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

        occ_out = occ_out.at[l].set(
            jnp.where(first, occ_rows, 0).astype(jnp.int32))
        base_out = base_out.at[l].set(
            jnp.where(first, base, 0).astype(jnp.int32))
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


def _min_levels(c: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Smallest level at which point i starts a new node.

    For sorted codes, point i opens a node at every level l with
    prefix(c[i], l) != prefix(c[i-1], l) — i.e. l >= depth - msb/3
    where msb is the highest bit set in c[i] ^ c[i-1].  One int64 xor
    + clz pass replaces the reference's per-level adjacent-prefix
    comparisons (and the old kernel's depth x N sweeps).  Duplicates
    (xor == 0) get depth+1: they are first at no level.  Point 0 gets
    0 (it opens every level including the root).
    """
    x = c ^ jnp.concatenate([c[:1] ^ -1, c[:-1]])
    hb = 63 - jax.lax.clz(x)                       # -1 when x == 0
    minlev = (depth
              - (hb - jnp.where(hb < 0, 2, 0)) // 3).astype(jnp.int32)
    minlev = jnp.minimum(minlev, depth + 1)
    return minlev.at[0].set(0)


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

    Fused single-pass formulation (round 5; the previous kernel did
    O(depth·N) full-array sweeps plus a depth·N searchsorted
    compaction and measured ~1 Mpt/s on chip):

      1. one int64 xor+clz pass gives each point the smallest level at
         which it opens a node (`_min_levels`),
      2. a (depth, N) int32 cumsum gives per-level node ranks, whose
         tails are the per-level counts — so every node's slot in the
         level-major output stream is known in closed form,
      3. ONE sorted segment-sum scatters each point's child-occupancy
         bit contribution (masked to its first occurrence) straight
         into the output byte stream.  Indices are globally
         non-decreasing, the form XLA:TPU vectorises.

    Everything after step 1 is int32: child octants come from the code
    split at bit 30 (an octant boundary), so no int64 emulation rides
    the (depth, N) sweep.  Replaces the per-node counting sort of
    geometry_octree_encoder.cpp:2210 and the BFS level loop
    (:2064-2152) with closed-form index math.

    Input: (N,) sorted leaf Morton codes (duplicates allowed).
    Returns (occ_u8 (cap,), counts (depth,) int32): level-major
    occupancy bytes, valid entries first; only the first sum(counts)
    bytes matter.  cap must be >= the total node count (caller sizes it
    ~2.5*N and retries larger on overflow; counts.sum() tells).
    """
    c = leaf_codes_sorted
    minlev = _min_levels(c, depth)

    lvec = jnp.arange(depth, dtype=jnp.int32)[:, None]       # (depth,1)
    first = minlev[None, :] <= lvec                          # (depth,N)
    seg = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    counts = seg[:, -1] + 1
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    dest = offs[:, None] + seg                               # (depth,N)

    # child octant of point i at level l+1 without int64 in the sweep:
    # split the code at bit 30 (an octant boundary; depth <= 20 keeps
    # the high word in 30 bits — deeper trees don't occur, levels are
    # capped by the 63-bit Morton domain and tmc3's 21-bit coordinates)
    shift = 3 * (depth - 1) - 3 * lvec                       # (depth,1)
    clo = (c & ((1 << 30) - 1)).astype(jnp.int32)
    chi = (c >> 30).astype(jnp.int32)
    oct_lo = (clo[None, :] >> jnp.minimum(shift, 29)) & 7
    oct_hi = (chi[None, :] >> jnp.maximum(shift - 30, 0)) & 7
    octant = jnp.where(shift >= 30, oct_hi, oct_lo)
    contrib = jnp.where(minlev[None, :] <= lvec + 1,
                        (1 << octant).astype(jnp.int32), 0)

    occ = jax.ops.segment_sum(contrib.reshape(-1), dest.reshape(-1),
                              num_segments=cap,
                              indices_are_sorted=True)
    return occ.astype(jnp.uint8), counts


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


_NTH_SET_BIT = None


def _nth_set_bit_table():
    """(256, 8) int8: entry [b, r] = index of the r-th set bit of byte
    b (garbage 0 past popcount).  Turns per-slot bit selection into one
    table gather."""
    global _NTH_SET_BIT
    if _NTH_SET_BIT is None:
        tab = np.zeros((256, 8), dtype=np.int8)
        for b in range(256):
            r = 0
            for k in range(8):
                if (b >> k) & 1:
                    tab[b, r] = k
                    r += 1
        _NTH_SET_BIT = tab
    return _NTH_SET_BIT


def _expand_level(nodes: jnp.ndarray, occ: jnp.ndarray,
                  nmax: int) -> tuple:
    """One decoder level: nodes + occupancy bytes -> child codes.

    Gather formulation (round 5): on TPU a scatter — even a sorted
    segment-sum — serialises (~100 M elem/s measured), while gathers
    and cumsums run at HBM speed.  So instead of scattering each child
    to its slot, every output SLOT gathers its source: slot k's parent
    row j_k comes from one expansion of node rows by their popcounts
    (jnp.repeat with a static total), its bit from the (256, 8)
    nth-set-bit table at rank k - starts[j_k].

    occ must already be zeroed past the node count.  Returns
    (child_codes (nmax,) int64 padded with I64_MAX, new_count i32).
    """
    row = jnp.arange(nmax, dtype=jnp.int32)
    occ32 = occ.astype(jnp.int32)
    pops = jax.lax.population_count(occ32)
    starts = jnp.cumsum(pops) - pops
    new_cnt = starts[-1] + pops[-1]
    src = jnp.repeat(jnp.arange(nmax, dtype=jnp.int32), pops,
                     total_repeat_length=nmax)
    rank = row - starts[src]
    tab = jnp.asarray(_nth_set_bit_table())
    bit = tab[occ32[src], jnp.clip(rank, 0, 7)].astype(jnp.int64)
    out = (nodes[src] << 3) | bit
    out = jnp.where(row < new_cnt, out, _I64_MAX)
    return out, new_cnt


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
    row = jnp.arange(nmax, dtype=jnp.int32)

    def body(l, carry):
        nodes, cnt = carry
        idx = jnp.minimum(offs[l] + row, cap - 1)
        occ = jnp.where(row < counts[l], occ_u8[idx], 0)
        out, new_cnt = _expand_level(nodes, occ, nmax)
        return out, new_cnt.astype(jnp.int64)

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
    row = jnp.arange(n, dtype=jnp.int32)

    def body(l, carry):
        nodes, cnt = carry
        occ = jnp.where(row < cnt, occ_levels[l], 0)
        out, new_cnt = _expand_level(nodes, occ, n)
        return out, new_cnt.astype(jnp.int64)

    # occupancy bit b is set when child (code<<3 | b) exists
    # (level_occupancy_np), so bits map 1:1 to octants.
    nodes0 = jnp.full(n, _I64_MAX, dtype=jnp.int64)
    nodes0 = nodes0.at[0].set(0)
    nodes, cnt = jax.lax.fori_loop(0, depth, body,
                                   (nodes0, jnp.int64(1)))
    return nodes, cnt
