"""Device-pipelined geometry encode/decode (runtime/device_pipeline).

Runs on the CPU backend (conftest forces JAX_PLATFORMS=cpu); the same
code paths carry the TPU production pipeline in bench.py.
"""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
from mpeg_pcc_tmc13_tpu.ops import octree as ops
from mpeg_pcc_tmc13_tpu.runtime import device_pipeline as dp
from mpeg_pcc_tmc13_tpu.utils import morton


def _cloud(n, depth, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, (n, 3)).astype(np.int64)
    codes = np.sort(morton.encode(pos))
    return ops.unique_sorted(codes)


def test_occ_stream_matches_per_level_path():
    """Native rce_occ_stream == per-level occupancy_sym, byte for byte."""
    depth = 7
    uniq = _cloud(4000, depth)
    levels = ops.build_levels_np(uniq, depth, ops.CTX_MODE_PARENT)
    occ_all = np.concatenate([l["occ"] for l in levels])

    enc1 = entropy.RangeEncoder()
    ctx1 = go.OctreeContexts()
    for lvl in levels:
        enc1.occupancy_sym(ctx1.occupancy_sym, lvl["ctx_base"],
                           lvl["occ"])
    enc2 = entropy.RangeEncoder()
    ctx2 = go.OctreeContexts()
    consumed = enc2.occ_stream(ctx2.occupancy_sym, occ_all, depth)
    assert consumed == occ_all.size
    assert enc1.get_bytes() == enc2.get_bytes()

    dec = entropy.RangeDecoder(enc2.get_bytes())
    ctx3 = go.OctreeContexts()
    back = dec.occ_stream(ctx3.occupancy_sym, occ_all.size + 64, depth)
    assert np.array_equal(back, occ_all)


def test_encode_occ_u8_matches_host_levels():
    """Device analysis emits the same occupancy byte stream as the
    numpy spec (level-major order)."""
    import jax.numpy as jnp
    depth = 6
    uniq = _cloud(2500, depth, seed=3)
    levels = ops.build_levels_np(uniq, depth, ops.CTX_MODE_PARENT)
    occ_all = np.concatenate([l["occ"] for l in levels])

    cap = 4 * uniq.size
    occ_d, counts = ops.encode_occ_u8(jnp.asarray(uniq), depth, cap)
    counts = np.asarray(counts)
    assert counts.tolist() == [l["occ"].size for l in levels]
    got = np.asarray(occ_d)[: int(counts.sum())]
    assert np.array_equal(got, occ_all)


def test_encode_occ_u8_collapses_duplicates():
    import jax.numpy as jnp
    depth = 5
    uniq = _cloud(500, depth, seed=5)
    dup = np.sort(np.concatenate([uniq, uniq[::3], uniq[-1:].repeat(7)]))
    cap = 4 * uniq.size
    o1, c1 = ops.encode_occ_u8(jnp.asarray(uniq), depth, cap)
    o2, c2 = ops.encode_occ_u8(jnp.asarray(dup), depth, cap)
    t = int(np.asarray(c1).sum())
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(o1)[:t], np.asarray(o2)[:t])


@pytest.mark.parametrize("num_slices", [1, 3, 8])
def test_pipeline_roundtrip(num_slices):
    depth = 7
    uniq = _cloud(6000, depth, seed=1)
    enc = entropy.RangeEncoder()
    ctx = go.OctreeContexts()
    st = dp.PipelineStats()
    dp.encode_pipelined(uniq, depth, enc, ctx, num_slices=num_slices,
                        stats=st)
    payload = enc.get_bytes()
    assert st.num_slices == num_slices
    assert sum(st.node_counts) > uniq.size  # nodes > leaves

    per = -(-uniq.size // num_slices)
    dec = entropy.RangeDecoder(payload)
    ctx2 = go.OctreeContexts()
    outs = dp.decode_pipelined(dec, ctx2, depth, num_slices, per)
    rec = []
    for nodes, cnt in outs:
        k = int(np.asarray(cnt))
        rec.append(np.asarray(nodes)[:k])
    rec = np.concatenate(rec)
    assert np.array_equal(rec, uniq)


def test_pipeline_stream_decodable_without_device():
    """The pipelined stream is a plain occ_stream sequence: the host
    native decoder alone reconstructs it (decoder never NEEDS a chip)."""
    depth = 6
    uniq = _cloud(3000, depth, seed=2)
    S = 4
    enc = entropy.RangeEncoder()
    ctx = go.OctreeContexts()
    dp.encode_pipelined(uniq, depth, enc, ctx, num_slices=S)
    dec = entropy.RangeDecoder(enc.get_bytes())
    ctx2 = go.OctreeContexts()
    rec = []
    for _ in range(S):
        occ = dec.occ_stream(ctx2.occupancy_sym, 8 * uniq.size, depth)
        # expand on host
        nodes = np.zeros(1, dtype=np.int64)
        pos = 0
        for l in range(depth):
            cur = occ[pos:pos + nodes.size]
            pos += nodes.size
            nodes = ops.expand_level_np(nodes, cur)
        rec.append(nodes)
    rec = np.concatenate(rec)
    assert np.array_equal(rec, uniq)


def test_pipeline_undersized_cap_retries():
    depth = 7
    uniq = _cloud(4000, depth, seed=4)
    enc = entropy.RangeEncoder()
    ctx = go.OctreeContexts()
    # cap_factor far too small: the per-slice retry must kick in
    dp.encode_pipelined(uniq, depth, enc, ctx, num_slices=2,
                        cap_factor=0.5)
    dec = entropy.RangeDecoder(enc.get_bytes())
    ctx2 = go.OctreeContexts()
    per = -(-uniq.size // 2)
    outs = dp.decode_pipelined(dec, ctx2, depth, 2, per)
    rec = np.concatenate([np.asarray(nodes)[:int(np.asarray(cnt))]
                          for nodes, cnt in outs])
    assert np.array_equal(rec, uniq)


def test_packed_link_roundtrip():
    """Device link packer (static prefix code) -> native unpacker is
    lossless for arbitrary occupancy byte values."""
    import ctypes as ct

    import jax.numpy as jnp
    depth = 6
    uniq = _cloud(3000, depth, seed=9)
    levels = ops.build_levels_np(uniq, depth, ops.CTX_MODE_PARENT)
    occ_all = np.concatenate([l["occ"] for l in levels])
    total = occ_all.size
    cap = 4 * uniq.size
    cap_packed = 2 * uniq.size
    h = np.asarray(ops.encode_occ_packed_hdr(
        jnp.asarray(uniq), depth, cap, cap_packed))
    cnt = h[:4 * depth].view(np.uint32)
    assert int(cnt.sum()) == total
    total_bits = int(h[4 * depth:4 * depth + 4].view(np.uint32)[0])
    lens, _ = ops._occ_code_tables()
    assert total_bits == int(lens[occ_all].sum())
    packed = np.ascontiguousarray(h[4 * depth + 4:])
    out = np.empty(total, dtype=np.uint8)
    entropy._LIB.occ_unpack(
        packed.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        out.ctypes.data_as(ct.POINTER(ct.c_uint8)), total)
    assert np.array_equal(out, occ_all)


def test_pipeline_packed_vs_raw_identical_stream():
    depth = 7
    uniq = _cloud(5000, depth, seed=11)
    streams = []
    for packed in (True, False):
        enc = entropy.RangeEncoder()
        ctx = go.OctreeContexts()
        dp.encode_pipelined(uniq, depth, enc, ctx, num_slices=4,
                            packed_link=packed)
        streams.append(enc.get_bytes())
    assert streams[0] == streams[1]


def test_pipeline_packed_overflow_falls_back():
    depth = 7
    uniq = _cloud(4000, depth, seed=13)
    enc = entropy.RangeEncoder()
    ctx = go.OctreeContexts()
    # absurdly small packed budget: every slice takes the raw retry
    dp.encode_pipelined(uniq, depth, enc, ctx, num_slices=2,
                        packed_link=True, packed_cap_factor=0.05)
    per = -(-uniq.size // 2)
    dec = entropy.RangeDecoder(enc.get_bytes())
    ctx2 = go.OctreeContexts()
    outs = dp.decode_pipelined(dec, ctx2, depth, 2, per)
    rec = np.concatenate([np.asarray(nodes)[:int(np.asarray(cnt))]
                          for nodes, cnt in outs])
    assert np.array_equal(rec, uniq)
