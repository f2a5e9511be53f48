"""Inter prediction + global motion tests."""

import io

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import hls
from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
from mpeg_pcc_tmc13_tpu.ops import motion as motion_ops
from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
from mpeg_pcc_tmc13_tpu.runtime.encoder import EncoderParams, FrameEncoder
from mpeg_pcc_tmc13_tpu.utils import morton


def moving_sequence(n=4000, depth=9, frames=4, shift=(3, 1, 0), seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(16, (1 << depth) - 64, size=(n, 3), dtype=np.int64)
    seq = []
    for f in range(frames):
        jitter = rng.integers(-1, 2, size=(n, 3))
        seq.append(PointCloud(base + np.asarray(shift) * f + jitter))
    return seq


def test_gm_identity_roundtrip():
    mat, trans = motion_ops.identity_motion()
    p = np.array([[5, 7, 9], [100, 200, 300]], dtype=np.int64)
    np.testing.assert_array_equal(
        motion_ops.apply_global_motion(p, mat, trans), p)


def test_gm_estimation_recovers_translation():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 512, (3000, 3), dtype=np.int64)
    cur = ref + np.array([7, -3, 2])
    mat, trans = motion_ops.estimate_global_motion(ref, cur)
    comp = motion_ops.apply_global_motion(ref, mat, trans)
    err = np.abs(comp - cur)
    assert np.median(err) <= 1


def roundtrip_sequence(seq, params):
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    for c in seq:
        enc.compress(c, lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    return outs, bs.getbuffer().nbytes


def test_inter_sequence_lossless_and_smaller():
    seq = moving_sequence()
    intra_params = EncoderParams()
    inter_params = EncoderParams(inter_prediction=True,
                                 random_access_period=8,
                                 global_motion=True)
    outs_a, size_a = roundtrip_sequence(seq, intra_params)
    outs_b, size_b = roundtrip_sequence(seq, inter_params)
    assert len(outs_b) == len(seq)
    for src, out in zip(seq, outs_b):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))
    # inter coding beats all-intra on a coherent moving sequence
    assert size_b < size_a


def test_inter_survives_random_access():
    seq = moving_sequence(frames=5)
    params = EncoderParams(inter_prediction=True, random_access_period=2,
                           global_motion=False)
    outs, _ = roundtrip_sequence(seq, params)
    assert len(outs) == 5
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))


def test_gbh_inter_fields_roundtrip():
    h = hls.GeometryBrickHeader(
        is_inter=True,
        gm_matrix=(65536, 10, -20, 0, 65000, 5, 1, 2, 66000),
        gm_trans=(-5, 9, 0), num_points=42, stream_lens=[7, 3])
    data = h.write()
    h2, off = hls.GeometryBrickHeader.parse(data)
    assert h2.is_inter and h2.gm_matrix == h.gm_matrix
    assert h2.gm_trans == h.gm_trans


def test_multistream_roundtrip():
    seq = moving_sequence(frames=1)
    params = EncoderParams(num_entropy_streams=4)
    outs, _ = roundtrip_sequence(seq, params)
    np.testing.assert_array_equal(
        np.sort(morton.encode(outs[0].positions)),
        np.unique(morton.encode(seq[0].positions)))


def test_multistream_stream_lengths_in_gbh():
    import io as _io
    seq = moving_sequence(frames=1)
    bs = _io.BytesIO()
    FrameEncoder(EncoderParams(num_entropy_streams=3)).compress(
        seq[0], lambda b: write_tlv(b, bs))
    bs.seek(0)
    for buf in iter_tlv(bs):
        if buf.type.name == "GEOMETRY_BRICK":
            h, off = hls.GeometryBrickHeader.parse(buf.data)
            assert len(h.stream_lens) == 3
            assert sum(h.stream_lens) == len(buf.data) - off


def roundtrip_sequence_flush(seq, params):
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    for c in seq:
        enc.compress(c, lambda b: write_tlv(b, bs))
    enc.flush(lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder as FD
    dec = FD(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    return outs, bs.getbuffer().nbytes


def test_bi_prediction_hierarchical_gof():
    seq = moving_sequence(frames=9)  # I + one full GOF of 8
    params = EncoderParams(inter_prediction=True, bi_prediction=True,
                           bi_period=8, global_motion=True,
                           random_access_period=64)
    outs, size_bi = roundtrip_sequence_flush(seq, params)
    assert len(outs) == 9
    # display order preserved, every frame lossless
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))
    # B frames with two refs should not be larger than P-only coding
    params_p = EncoderParams(inter_prediction=True, global_motion=True,
                             random_access_period=64)
    _, size_p = roundtrip_sequence_flush(seq, params_p)
    assert size_bi < size_p * 1.1


def test_bi_prediction_partial_gof_flush():
    seq = moving_sequence(frames=5)  # I + 4 buffered (incomplete GOF)
    params = EncoderParams(inter_prediction=True, bi_prediction=True,
                           bi_period=8, random_access_period=64)
    outs, _ = roundtrip_sequence_flush(seq, params)
    assert len(outs) == 5
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))


def test_attr_inter_prediction_end_to_end():
    from mpeg_pcc_tmc13_tpu.runtime.encoder import AttributeConfig
    rng = np.random.default_rng(21)
    n, depth = 4000, 9
    base = rng.integers(16, (1 << depth) - 16, size=(n, 3), dtype=np.int64)
    refl = rng.integers(0, 256, n).astype(np.uint16)
    seq = [PointCloud(base + np.array([2, 1, 0]) * f, reflectances=refl)
           for f in range(3)]   # moving geometry, STATIC attributes
    common = dict(inter_prediction=True, global_motion=True,
                  random_access_period=16)
    attr = lambda ip: [AttributeConfig(
        "reflectance", 8, hls.AttributeEncoding.PRED, qp=4, inter_pred=ip)]
    sizes = {}
    for ip in (False, True):
        params = EncoderParams(attributes=attr(ip), **common)
        outs, sizes[ip] = roundtrip_sequence_flush(seq, params)
        for src, out in zip(seq, outs):
            # attributes lossless: compare (position, value) multisets
            ka = np.argsort(morton.encode(src.positions), kind="stable")
            kb = np.argsort(morton.encode(out.positions), kind="stable")
            np.testing.assert_array_equal(
                src.reflectances[ka], out.reflectances[kb])
    # static attributes over moving geometry: the stream includes the
    # (identical) geometry payloads, so the total shrinks ~25%; the
    # attribute payloads themselves collapse by ~4x
    assert sizes[True] < sizes[False] * 0.78


def test_raht_inter_prediction_end_to_end():
    from mpeg_pcc_tmc13_tpu.runtime.encoder import AttributeConfig
    rng = np.random.default_rng(31)
    n, depth = 3000, 9
    base = rng.integers(16, (1 << depth) - 16, size=(n, 3), dtype=np.int64)
    colors = np.stack([(base[:, 0] // 2) % 256, (base[:, 1] // 3) % 256,
                       (base.sum(axis=1) // 4) % 256],
                      axis=1).astype(np.uint16)
    seq = [PointCloud(base + np.array([1, 2, 0]) * f, colors=colors)
           for f in range(3)]
    common = dict(inter_prediction=True, global_motion=True,
                  random_access_period=16)
    sizes = {}
    for ip in (False, True):
        params = EncoderParams(attributes=[AttributeConfig(
            "color", 8, hls.AttributeEncoding.RAHT, qp=4,
            raht_integer_haar=True, inter_pred=ip)], **common)
        outs, sizes[ip] = roundtrip_sequence_flush(seq, params)
        for src, out in zip(seq, outs):
            ka = np.argsort(morton.encode(src.positions), kind="stable")
            kb = np.argsort(morton.encode(out.positions), kind="stable")
            np.testing.assert_array_equal(src.colors[ka], out.colors[kb])
    assert sizes[True] < sizes[False]


def locally_moving_sequence(n=6000, depth=9, frames=3, seed=9):
    """Two halves moving in opposite directions — global motion can't
    fit both, local (LPU) motion can."""
    rng = np.random.default_rng(seed)
    base = rng.integers(32, (1 << depth) - 64, size=(n, 3),
                        dtype=np.int64)
    left = base[:, 0] < (1 << depth) // 2
    seq = []
    for f in range(frames):
        pos = base.copy()
        pos[left] += np.asarray([5, 0, 0]) * f
        pos[~left] += np.asarray([-4, 2, 0]) * f
        seq.append(PointCloud(np.clip(pos, 0, (1 << depth) - 1)))
    return seq


def test_lpu_motion_ops_roundtrip():
    from mpeg_pcc_tmc13_tpu.bitstream import entropy
    rng = np.random.default_rng(10)
    ref = rng.integers(0, 512, (8000, 3), dtype=np.int64)
    cur = ref.copy()
    half = ref[:, 0] < 256
    cur[half] += np.array([5, 0, 0])
    cur = np.clip(cur, 0, 511)
    enc = entropy.RangeEncoder()
    ctx = entropy.new_contexts(motion_ops.LPU_CTX_SIZE)
    refined = motion_ops.encode_lpu_motion(enc, ctx, ref, cur, 6, 9)
    dec = entropy.RangeDecoder(enc.get_bytes())
    ctx2 = entropy.new_contexts(motion_ops.LPU_CTX_SIZE)
    refined2 = motion_ops.decode_lpu_motion(dec, ctx2, ref, 6, 9)
    np.testing.assert_array_equal(refined, refined2)
    cc = np.unique(morton.encode(cur))
    before = np.isin(cc, np.unique(morton.encode(ref))).sum()
    after = np.isin(cc, np.unique(morton.encode(refined))).sum()
    assert after > before * 1.2


def test_lpu_motion_codec_gain():
    """Opposite-moving halves: LPU refinement shrinks inter geometry
    where global motion alone cannot."""
    seq = locally_moving_sequence()
    expect = [np.unique(morton.encode(c.positions)) for c in seq]
    sizes = {}
    for lpu in (False, True):
        params = EncoderParams(inter_prediction=True,
                               random_access_period=8,
                               lpu_motion=lpu)
        outs, total = roundtrip_sequence(seq, params)
        assert len(outs) == len(seq)
        for out, exp in zip(outs, expect):
            np.testing.assert_array_equal(
                np.sort(morton.encode(out.positions.astype(np.int64))),
                exp)
        sizes[lpu] = total
    assert sizes[True] < sizes[False]


def test_lpu_road_object_split():
    """Road-object LPU (reference lpuType=0): ground points keep the
    global motion, objects get per-LPU refinement; classification of
    the shared compensated reference is normative (GBH z0/thr)."""
    rng = np.random.default_rng(15)
    n = 8000
    # ground plane at z~20 + objects above moving differently
    ground = np.column_stack([rng.integers(0, 512, n // 2),
                              rng.integers(0, 512, n // 2),
                              20 + rng.integers(-2, 3, n // 2)])
    obj = np.column_stack([rng.integers(100, 400, n // 2),
                           rng.integers(100, 400, n // 2),
                           rng.integers(40, 200, n // 2)])
    f0 = np.concatenate([ground, obj]).astype(np.int64)
    f1 = f0.copy()
    f1[n // 2:] += np.array([6, 0, 0])   # objects move, ground static
    f1 = np.clip(f1, 0, 511)
    seq = [PointCloud(f0), PointCloud(f1)]
    expect = [np.unique(morton.encode(c.positions)) for c in seq]
    for lpu_type in (1, 0):
        params = EncoderParams(inter_prediction=True,
                               random_access_period=8,
                               lpu_motion=True, lpu_type=lpu_type)
        outs, total = roundtrip_sequence(seq, params)
        assert len(outs) == 2
        for out, exp in zip(outs, expect):
            np.testing.assert_array_equal(
                np.sort(morton.encode(out.positions.astype(np.int64))),
                exp)


def test_long_sequence_frame_ctr_wraparound():
    """262-frame P-sequence: the just-stored frame (lsb 0 after 8-bit
    wraparound) must never be evicted ahead of older frames (advisor
    finding r1: sorted-key eviction desynced encoder and decoder)."""
    seq = moving_sequence(n=80, depth=7, frames=262, shift=(1, 0, 0))
    params = EncoderParams(inter_prediction=True,
                           random_access_period=64,
                           global_motion=False)
    outs, _ = roundtrip_sequence(seq, params)
    assert len(outs) == len(seq)
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))


def test_small_frame_ctr_bits_inter():
    """frame_ctr_bits=4 with inter prediction: ref deltas, frame-store
    keys and reorder advance must all honour the signalled mask
    (advisor finding r1: hard-coded & 0xFF desynced at frame 16)."""
    seq = moving_sequence(n=80, depth=7, frames=20, shift=(1, 0, 0))
    params = EncoderParams(inter_prediction=True,
                           random_access_period=64,
                           global_motion=False,
                           frame_ctr_bits=4)
    outs, _ = roundtrip_sequence(seq, params)
    assert len(outs) == len(seq)
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))


def test_decoder_missing_reference_raises():
    """An inter brick whose reference frame is absent must raise a
    diagnosable error, not silently decode with intra contexts."""
    seq = moving_sequence(n=80, depth=7, frames=3, shift=(1, 0, 0))
    bs = io.BytesIO()
    enc = FrameEncoder(EncoderParams(inter_prediction=True,
                                     random_access_period=64,
                                     global_motion=False))
    for c in seq:
        enc.compress(c, lambda b: write_tlv(b, bs))
    bs.seek(0)
    payloads = list(iter_tlv(bs))
    dec = FrameDecoder(lambda c: None)
    # feed parameter sets but skip frame 0's bricks -> frame 1's inter
    # brick references a frame the decoder never stored
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import PayloadType
    skipping_frame0 = True
    with pytest.raises(ValueError, match="reference"):
        for b in payloads:
            if b.type in (PayloadType.GEOMETRY_BRICK,
                          PayloadType.ATTRIBUTE_BRICK) and skipping_frame0:
                continue
            if b.type == PayloadType.FRAME_BOUNDARY_MARKER:
                skipping_frame0 = False
            dec.decompress(b)
        dec.flush()


def test_inter_obuf_engine_roundtrip_and_gain():
    """Inter bricks through the OBUF engine: the compensated reference
    selects the map bank per occupancy bit (refcodec
    tmc13ref_*_octree_inter).  Lossless round-trip, and inter beats
    all-intra OBUF on a coherent moving sequence."""
    seq = moving_sequence()
    intra = EncoderParams(engine="obuf")
    inter = EncoderParams(engine="obuf", inter_prediction=True,
                          random_access_period=8, global_motion=True)
    outs_a, size_a = roundtrip_sequence(seq, intra)
    outs_b, size_b = roundtrip_sequence(seq, inter)
    assert len(outs_b) == len(seq)
    for src, out in zip(seq, outs_b):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))
    assert size_b < size_a


def test_inter_obuf_engine_with_lpu():
    """OBUF inter bricks with LPU refinement: the MV table travels as
    a leading range-coded stream; lossless round-trip."""
    seq = moving_sequence(shift=(5, 2, 0))
    params = EncoderParams(engine="obuf", inter_prediction=True,
                           random_access_period=8, global_motion=True,
                           lpu_motion=True, lpu_type=1)
    outs, _ = roundtrip_sequence(seq, params)
    assert len(outs) == len(seq)
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))


def test_obuf_inter_entry_reduces_to_intra():
    """With no reference points the inter refcodec entries must emit
    byte-identical payloads to the intra entries (conformance ABI)."""
    from mpeg_pcc_tmc13_tpu.bitstream import hls
    from mpeg_pcc_tmc13_tpu.models import geometry_obuf
    rng = np.random.default_rng(9)
    pos = np.unique(rng.integers(0, 256, (5000, 3)).astype(np.int64),
                    axis=0)
    gps = hls.GeometryParameterSet(planar_mode_enabled=True)
    a = geometry_obuf.encode(pos, 8, None, gps)
    b = geometry_obuf.encode(pos, 8, None, gps,
                             ref_local=np.zeros((0, 3), np.int64))
    assert a == b
    # and a populated reference changes the stream but round-trips
    ref = pos + rng.integers(-1, 2, pos.shape)
    c = geometry_obuf.encode(pos, 8, None, gps, ref_local=ref)
    out = geometry_obuf.decode(c, pos.shape[0], 8, None, gps,
                               ref_local=ref)
    from mpeg_pcc_tmc13_tpu.utils import morton
    np.testing.assert_array_equal(
        np.sort(morton.encode(out)), np.sort(morton.encode(pos)))


def test_inter_obuf_engine_with_split_lpu():
    """OBUF inter + road-object split LPU (lpuType=0): the ground
    plane keeps GM, objects get cuboid refinement; MV table rides the
    leading stream.  Lossless round-trip."""
    seq = moving_sequence(shift=(4, 0, 1), seed=3)
    params = EncoderParams(engine="obuf", inter_prediction=True,
                           random_access_period=8, global_motion=True,
                           lpu_motion=True, lpu_type=0)
    outs, _ = roundtrip_sequence(seq, params)
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.unique(morton.encode(src.positions)))
