"""3-D Morton (Z-order) codes — the universal sort key of this codec.

The reference walks an explicit octree with a ring buffer
(`tmc3/geometry_octree_encoder.cpp:1853`, `ringbuf.h`); here the octree is
*implicit* in the sorted Morton codes of the points: the nodes of level
``l`` of a depth-``d`` octree are exactly the unique values of
``code >> 3*(d-l)``.  Every geometry/attribute pass in this framework is a
vectorised sweep over these sorted codes.

Reference parity: the interleaving convention matches the reference's
``mortonAddr`` (tmc3/PCCTMC3Common.h, "interleave x,y,z with x in the
high bit") so that traversal orders, sibling grouping, and child indices
(bit pattern ``x<<2 | y<<1 | z``) agree with the octree child numbering
used by tmc3's occupancy bytes (tmc3/geometry_octree.h:88).

Both numpy (host) and jax (device) implementations are provided; they are
bit-identical.  Codes are int64 (21 bits/axis max, 63-bit codes), with an
int32 fast path for depth <= 10 used by the device passes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

MAX_DEPTH = 21  # bits per axis; 3*21 = 63 bits fits int64


def _part1by2_64(v):
    """Spread the low 21 bits of v so there are two zero bits between each.

    Works for numpy and jax arrays (uint64/int64 semantics via int64).
    """
    x = v & 0x1FFFFF  # 21 bits
    x = (x | (x << 32)) & 0x1F00000000FFFF
    x = (x | (x << 16)) & 0x1F0000FF0000FF
    x = (x | (x << 8)) & 0x100F00F00F00F00F
    x = (x | (x << 4)) & 0x10C30C30C30C30C3
    x = (x | (x << 2)) & 0x1249249249249249
    return x


def _compact1by2_64(x):
    """Inverse of _part1by2_64: gather every third bit."""
    x = x & 0x1249249249249249
    x = (x ^ (x >> 2)) & 0x10C30C30C30C30C3
    x = (x ^ (x >> 4)) & 0x100F00F00F00F00F
    x = (x ^ (x >> 8)) & 0x1F0000FF0000FF
    x = (x ^ (x >> 16)) & 0x1F00000000FFFF
    x = (x ^ (x >> 32)) & 0x1FFFFF
    return x


def _native_lib():
    from ..bitstream import entropy as _ent
    return _ent._LIB


def encode(pos, xp=np):
    """positions (..., 3) int -> Morton codes (...,) int64.

    Axis 0 (x) occupies the highest interleaved bit, matching the
    reference child index convention ``(x<<2)|(y<<1)|z``.
    """
    if xp is np and isinstance(pos, np.ndarray) and pos.ndim == 2 \
            and pos.shape[1] == 3:
        lib = _native_lib()
        if lib is not None:
            import ctypes
            p = np.ascontiguousarray(pos, dtype=np.int64)
            out = np.empty(p.shape[0], dtype=np.int64)
            lib.morton_encode64(
                p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                p.shape[0],
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return out
    p = pos.astype(xp.int64)
    return (
        (_part1by2_64(p[..., 0]) << 2)
        | (_part1by2_64(p[..., 1]) << 1)
        | _part1by2_64(p[..., 2])
    )


def decode(code, xp=np):
    """Morton codes (...,) int64 -> positions (..., 3) int64."""
    if xp is np and isinstance(code, np.ndarray) and code.ndim == 1:
        lib = _native_lib()
        if lib is not None:
            import ctypes
            cc = np.ascontiguousarray(code, dtype=np.int64)
            out = np.empty((cc.shape[0], 3), dtype=np.int64)
            lib.morton_decode64(
                cc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cc.shape[0],
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return out
    c = code.astype(xp.int64)
    x = _compact1by2_64(c >> 2)
    y = _compact1by2_64(c >> 1)
    z = _compact1by2_64(c)
    return xp.stack([x, y, z], axis=-1)


def encode_jax(pos):
    return encode(pos, xp=jnp)


def decode_jax(code):
    return decode(code, xp=jnp)


def child_index(code, shift):
    """3-bit child index of a code at a given level shift (0 = leaf)."""
    return (code >> (3 * shift)) & 7


def neighbor_codes_6(code, shift=0, xp=np):
    """Codes of the 6 face neighbours (+x,-x,+y,-y,+z,-z) at node scale.

    ``code`` are node codes at some level (already shifted).  Out-of-range
    neighbours (coordinate underflow below 0 / overflow) are the caller's
    concern; coordinates are computed in int64 so +-1 never wraps within
    21-bit range, and negative coordinates produce codes with high garbage
    bits that will simply never match a real node.
    """
    p = decode(code, xp=xp)
    out = []
    for axis in range(3):
        for delta in (1, -1):
            q = p.copy() if xp is np else p
            if xp is np:
                q = p.copy()
                q[..., axis] = p[..., axis] + delta
                out.append(encode(q, xp=xp))
            else:
                q = p.at[..., axis].add(delta)
                out.append(encode(q, xp=xp))
    return xp.stack(out, axis=-1)  # (..., 6)


# --- generic morton-neighbour computation used by octree contexts -------

_NEIGH_OFFSETS_6 = np.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    dtype=np.int64,
)


def neighbours_valid_mask(pos, offsets, dims):
    """Mask of which pos+offset stay inside [0, 2**dims) per axis.

    pos: (N,3) int; offsets: (K,3) int; dims: scalar or (3,) log2 sizes.
    Returns (N,K) bool.
    """
    xp = jnp if isinstance(pos, jnp.ndarray) else np
    lim = (xp.asarray(1, dtype=xp.int64) << xp.asarray(dims, dtype=xp.int64))
    q = pos[:, None, :] + offsets[None, :, :]
    return xp.all((q >= 0) & (q < lim), axis=-1)
