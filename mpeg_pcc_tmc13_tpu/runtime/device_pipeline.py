"""Device-in-the-loop geometry pipeline.

The production TPU encode runs a three-stage pipeline per slice (one
slice = the whole frame on a single chip; S slices when sharding):

  1. device: full-depth octree analysis -> level-major occupancy bytes
     (ops.octree.encode_occ_u8; one byte per tree node, the wavefront
     split of SURVEY.md §7.3),
  2. link:   two-step fetch — the counts header, then only the
     size-bucketed used bytes (the link carries ~1.2 B/pt, the
     occupancy payload, never the worst-case budget).  With multiple
     slices a prefetch thread pulls slice s+1 while the host codes s,
  3. host:   one native call per slice entropy-codes the stream with
     PARENT contexts derived from the stream itself
     (entropy.cc rce_occ_stream; contexts continue across slices like
     tmc3's entropy continuation, hls entropy_continuation_enabled).

The raw occupancy-byte link is the default: the on-device prefix-code
packer (encode_occ_packed_hdr) saves ~0.5 B/pt but costs ~330 ms of
XLA scatter-OR at 1 Mpt — measured, the wrong trade at any link speed
this hardware sees; it remains available via packed_link=True and is
bitstream-identical.

Decode mirrors it: the host entropy stage is self-sufficient (each
slice's byte stream is self-delimiting: the root byte's popcount sizes
the next level, and so on), occupancy bytes stream host->device, and
ops.octree.decode_expand_stream rebuilds the leaf codes entirely on
device — gather-formulated, since TPU scatters serialise — where they
feed the device attribute stages without positions ever landing on
the host.

Counterpart of the reference's per-slice encode loop
(encoder.cpp:924-1308) restructured for an accelerator + narrow host
link; slices are the concurrency surface the bitstream already has
(SURVEY.md §2.9).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream import entropy
from ..ops import octree as ops


def _split_padded(codes_sorted: np.ndarray, num_slices: int):
    """Split sorted codes into equal fixed-shape chunks (pad = repeat of
    the chunk's last code; duplicates collapse at the leaf level)."""
    n = codes_sorted.size
    per = -(-n // num_slices)
    chunks = np.empty((num_slices, per), dtype=np.int64)
    for s in range(num_slices):
        c = codes_sorted[s * per:(s + 1) * per]
        chunks[s, :c.size] = c
        chunks[s, c.size:] = c[-1] if c.size else 0
    return chunks


@dataclass
class PipelineStats:
    wall_s: float = 0.0
    host_entropy_s: float = 0.0
    link_bytes: int = 0
    num_slices: int = 0
    node_counts: List[int] = field(default_factory=list)


def encode_pipelined(codes_sorted: np.ndarray, depth: int,
                     enc, ctx, num_slices: int = 8,
                     cap_factor: float = 2.3,
                     packed_link: bool = True,
                     packed_cap_factor: float = 1.6,
                     device_codes: Optional[list] = None,
                     stats: Optional[PipelineStats] = None) -> None:
    """Encode sorted unique leaf codes through the device pipeline.

    enc/ctx: entropy.RangeEncoder + OctreeContexts (occupancy_sym
    memory); contexts continue across slices, producing ONE stream that
    decode_pipelined (or any rcd_occ_stream caller) reads back.
    device_codes: optional pre-staged per-slice device arrays (the
    production setup keeps geometry device-resident between stages);
    when None the chunks are uploaded here.
    packed_link: compress the device->host bytes with the static
    occupancy prefix code (ops.octree.encode_occ_packed_hdr); the
    bitstream is identical either way.
    """
    import ctypes as ct

    import jax
    import jax.numpy as jnp

    if device_codes is None:
        chunks = _split_padded(codes_sorted, num_slices)
        device_codes = [jax.device_put(jnp.asarray(chunks[s]))
                        for s in range(num_slices)]
        jax.block_until_ready(device_codes)
    per = device_codes[0].shape[0]
    cap = max(64, int(per * cap_factor)) & ~63
    cap_packed = max(64, int(per * packed_cap_factor)) & ~63
    lib = entropy._LIB

    t0 = time.perf_counter()
    # stage 1: dispatch all slices (async on device)
    if packed_link:
        pending = [ops.encode_occ_packed_hdr(dc, depth, cap, cap_packed)
                   for dc in device_codes]
    else:
        pending = [ops.encode_occ_u8_hdr(dc, depth, cap)
                   for dc in device_codes]

    fetched = [0]

    def _fetch(buf):
        """Two-step fetch of one slice: tiny counts header, then only
        the pow2-bucketed used prefix — the link carries ~the
        occupancy payload, not the budget.  Returns (occ, total) with
        occ None when the slice overflowed its budget."""
        occ = None
        if packed_link:
            hdr_w = 4 * depth + 4
            h = np.asarray(buf[:hdr_w])
            cnt = h[:4 * depth].view(np.uint32)
            total = int(cnt.sum())
            total_bits = int(h[4 * depth:].view(np.uint32)[0])
            fetched[0] += h.nbytes
            ok = (total <= cap
                  and total_bits <= 8 * cap_packed - 24)
            if ok:
                bucket = min(cap_packed,
                             _pow2_bucket(total_bits // 8 + 4))
                packed = np.asarray(buf[hdr_w:hdr_w + bucket])
                fetched[0] += packed.nbytes
                occ = np.empty(total, dtype=np.uint8)
                lib.occ_unpack(
                    packed.ctypes.data_as(ct.POINTER(ct.c_uint8)),
                    occ.ctypes.data_as(ct.POINTER(ct.c_uint8)),
                    total)
        else:
            h = np.asarray(buf[:4 * depth])
            cnt = h.view(np.uint32)
            total = int(cnt.sum())
            fetched[0] += h.nbytes
            if total <= cap:
                bucket = min(cap, _pow2_bucket(total))
                body = np.asarray(
                    buf[4 * depth:4 * depth + bucket])
                fetched[0] += body.nbytes
                occ = body[:total]
        return occ, total

    # stages 2+3 overlapped: a prefetch thread pulls slice s+1 through
    # the link (np.asarray releases the GIL during the copy) while the
    # main thread entropy-codes slice s
    t_host = 0.0
    ncounts = []
    pool = None
    nxt = None
    if len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)
        nxt = pool.submit(_fetch, pending[0])
    for si, buf in enumerate(pending):
        if nxt is not None:
            occ, total = nxt.result()
            if si + 1 < len(pending):
                nxt = pool.submit(_fetch, pending[si + 1])
        else:
            occ, total = _fetch(buf)
        if occ is None:
            # undersized budget: redo this slice through the raw path
            big = max(64, int(max(total, cap) * 1.25)) & ~63
            h = np.asarray(ops.encode_occ_u8_hdr(
                device_codes[si], depth, big))
            cnt = h[:4 * depth].view(np.uint32)
            total = int(cnt.sum())
            occ = h[4 * depth:4 * depth + total]
            fetched[0] += h.nbytes
        th = time.perf_counter()
        enc.occ_stream(ctx.occupancy_sym, occ, depth)
        t_host += time.perf_counter() - th
        ncounts.append(total)
    if pool is not None:
        pool.shutdown(wait=False)
    link = fetched[0]
    if stats is not None:
        stats.wall_s = time.perf_counter() - t0
        stats.host_entropy_s = t_host
        stats.link_bytes = link
        stats.num_slices = num_slices
        stats.node_counts = ncounts


def _pow2_bucket(n: int, floor: int = 64) -> int:
    """Quarter-pow2 size bucket >= n: {1, 1.25, 1.5, 1.75} * 2^k.
    Bounds fetch overshoot at 25% (a plain pow2 bucket wastes up to 2x
    link bytes) while keeping the compiled slice-shape family small."""
    b = floor
    while b < n:
        b <<= 1
    if b > floor and b >= 8:
        for eighths in (5, 6, 7):   # 0.625, 0.75, 0.875 * 2^k
            c = eighths * (b >> 3)
            if c >= n:
                return c
    return b


def decode_pipelined(dec, ctx, depth: int, num_slices: int,
                     per_slice_points: int,
                     stats: Optional[PipelineStats] = None):
    """Decode a pipelined stream back to per-slice leaf codes ON DEVICE.

    Returns a list of (codes_device (nmax,) int64 padded with INT64_MAX,
    count_device) per slice — left on device so the attribute stages can
    consume them without a host round trip.
    """
    import jax
    import jax.numpy as jnp

    nmax = per_slice_points
    # host decode uses the worst-case node bound (the stream is
    # self-delimiting, so the true total is known only afterwards);
    # the h2d transfer is then padded to a half-slice bucket, which
    # bounds both the waste (< nmax/2 bytes) and the number of
    # distinct compiled expand kernels (<= 2 * depth)
    host_cap = depth * nmax + 64
    bucket = max(64, nmax // 2)
    t0 = time.perf_counter()
    t_host = 0.0
    link = 0
    outs = []
    for _ in range(num_slices):
        th = time.perf_counter()
        occ = dec.occ_stream(ctx.occupancy_sym, host_cap, depth)
        t_host += time.perf_counter() - th
        # per-level counts from the self-delimiting stream
        counts = np.zeros(depth, dtype=np.int32)
        pos, ln = 0, 1
        pops = np.unpackbits(occ[:, None], axis=1).sum(axis=1)
        for l in range(depth):
            counts[l] = ln
            nxt = int(pops[pos:pos + ln].sum())
            pos += ln
            ln = nxt
        cap = -(-occ.size // bucket) * bucket
        pad = np.zeros(cap, dtype=np.uint8)
        pad[:occ.size] = occ
        link += pad.nbytes + counts.nbytes
        occ_d = jax.device_put(jnp.asarray(pad))          # async h2d
        cnt_d = jax.device_put(jnp.asarray(counts))
        outs.append(ops.decode_expand_stream(occ_d, cnt_d, depth, nmax))
    jax.block_until_ready(outs)
    if stats is not None:
        stats.wall_s = time.perf_counter() - t0
        stats.host_entropy_s = t_host
        stats.link_bytes = link
        stats.num_slices = num_slices
    return outs
