"""rANS geometry engine: brick-payload wrapper over ops/octree_rans.

The payload is a self-contained on-device bitstream — analysis,
context modelling and entropy coding all execute on the accelerator
(K-lane interleaved rANS with level-causal adaptive tables, see
ops/octree_rans.py).  The host's only job is moving the compressed
bytes (~1 B/pt), i.e. the link carries the information-theoretic
payload and nothing else.

This replaces the reference's serial-arithmetic geometry payload
(geometry_octree_encoder.cpp:1853-2660 + EntropyEncoder) for bricks
coded with gps.rans_engine; like the OBUF engine it is an intra,
single-stream, unique-points brick format of the native syntax.

Payload layout: [u8 lanes_log2][encode_device buffer (see
ops/octree_rans.encode_device)].  Slice shapes are padded to the next
power-of-two node budget so the jitted kernels compile once per
(depth, budget) bucket, not once per slice.
"""

from __future__ import annotations

import numpy as np

from ..utils import morton


def _lanes_for(n: int) -> int:
    """Lane count: full 8x128 VPU tile for big slices, fewer for small
    ones (the payload header carries 8 bytes per lane)."""
    if n >= (1 << 17):
        return 1024
    if n >= (1 << 13):
        return 256
    return 64


def _bucket(n: int) -> int:
    """Next power-of-two node budget >= n (>= 64): bounds the number
    of distinct compiled kernel shapes to log2(Nmax) per depth."""
    b = 64
    while b < n:
        b <<= 1
    return b


def encode(positions_local: np.ndarray, depth: int) -> bytes:
    """Encode integer slice-local positions into a rANS brick payload.

    Duplicate points are not representable (unique_points bricks only);
    callers pass deduplicated positions.
    """
    import jax.numpy as jnp

    from ..ops import octree_rans as R

    codes = np.sort(morton.encode(positions_local.astype(np.int64)))
    uniq = codes[np.concatenate(
        [[True], codes[1:] != codes[:-1]])] if codes.size else codes
    n = int(uniq.size)
    if n == 0:
        return bytes([0])
    nmax = _bucket(n)
    lanes = min(_lanes_for(n), nmax)
    # pad with copies of the last code: duplicates collapse at every
    # level of the analysis, so the node structure is unchanged
    leaf = np.empty(nmax, dtype=np.int64)
    leaf[:n] = uniq
    leaf[n:] = uniq[-1]
    buf, used = R.encode_device(jnp.asarray(leaf), depth, nmax, lanes)
    u8 = np.asarray(buf)[:int(used)]
    out = np.empty(u8.size + 1, dtype=np.uint8)
    out[0] = lanes.bit_length() - 1          # log2(lanes)
    out[1:] = u8
    return out.tobytes()


def decode(payload: bytes, num_points: int, depth: int) -> np.ndarray:
    """Decode a rANS brick payload back to slice-local positions
    (Morton order, unique points)."""
    import jax.numpy as jnp

    from ..ops import octree_rans as R

    u8 = np.frombuffer(payload, dtype=np.uint8)
    if num_points == 0 or u8.size <= 1:
        return np.zeros((0, 3), dtype=np.int64)
    lanes = 1 << int(u8[0])
    counts, states, words = R.parse_payload(u8[1:], depth, lanes)
    nmax = _bucket(num_points)
    wcap = _bucket(max(64, words.shape[0]))
    wp = np.zeros(wcap, np.int32)
    wp[:words.shape[0]] = words
    nodes, cnt = R.decode_device(
        jnp.asarray(counts), jnp.asarray(states),
        jnp.asarray(wp), depth, nmax, lanes)
    leaves = np.asarray(nodes)[:int(cnt)]
    return morton.decode(leaves)
