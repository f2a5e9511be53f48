"""Constant attributes, loss resilience, entropy continuation tests."""

import io

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import hls
from mpeg_pcc_tmc13_tpu.bitstream.tlv import (PayloadType, iter_tlv,
                                              write_tlv)
from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                EncoderParams, FrameEncoder)
from mpeg_pcc_tmc13_tpu.utils import morton


def cloud(n=2000, depth=9, seed=0, const_color=None, refl=False):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    colors = (np.tile(np.asarray(const_color, dtype=np.uint16), (n, 1))
              if const_color is not None else None)
    r = rng.integers(0, 256, n).astype(np.uint16) if refl else None
    return PointCloud(pos, colors, r)


def encode_payloads(c, params):
    bufs = []
    FrameEncoder(params).compress(c, bufs.append)
    return bufs


def decode_payloads(bufs, **kw):
    outs = []
    dec = FrameDecoder(outs.append, **kw)
    for b in bufs:
        dec.decompress(b)
    dec.flush()
    return outs


def test_constant_attribute_payload():
    c = cloud(const_color=(77, 128, 200))
    params = EncoderParams(attributes=[
        AttributeConfig("color", 8, hls.AttributeEncoding.RAHT,
                        qp=4, raht_integer_haar=True)])
    bufs = encode_payloads(c, params)
    types = [b.type for b in bufs]
    assert PayloadType.CONSTANT_ATTRIBUTE in types
    assert PayloadType.ATTRIBUTE_BRICK not in types
    outs = decode_payloads(bufs)
    assert np.all(outs[0].colors == np.array([77, 128, 200]))


def test_lost_attribute_brick_yields_defaults():
    c = cloud(refl=True)
    params = EncoderParams(attributes=[
        AttributeConfig("reflectance", 8, hls.AttributeEncoding.PRED,
                        qp=4)])
    bufs = encode_payloads(c, params)
    # drop the attribute brick (simulated loss)
    bufs = [b for b in bufs if b.type != PayloadType.ATTRIBUTE_BRICK]
    outs = decode_payloads(bufs)
    assert outs[0].count > 0
    assert outs[0].reflectances is not None
    assert np.all(outs[0].reflectances == 128)  # mid-range default


def test_entropy_continuation_across_slices():
    c = cloud(n=6000)
    base = dict(max_points_per_slice=1500)
    sizes = {}
    for cont in (False, True):
        params = EncoderParams(entropy_continuation=cont, **base)
        bufs = encode_payloads(c, params)
        sizes[cont] = sum(len(b.data) for b in bufs)
        outs = decode_payloads(bufs)
        np.testing.assert_array_equal(
            np.sort(morton.encode(outs[0].positions)),
            np.unique(morton.encode(c.positions)))
    # continuation shares adapted contexts -> smaller stream
    assert sizes[True] < sizes[False]


def test_truncated_stream_does_not_crash():
    c = cloud()
    bufs = encode_payloads(c, EncoderParams())
    bs = io.BytesIO()
    for b in bufs:
        write_tlv(b, bs)
    data = bs.getvalue()[: len(bs.getvalue()) // 2]
    outs = []
    dec = FrameDecoder(outs.append)
    try:
        for b in iter_tlv(io.BytesIO(data)):
            dec.decompress(b)
    except (EOFError, ValueError):
        pass
    dec.flush()  # must not raise


def test_inter_entropy_continuation_shrinks():
    from tests.test_inter import moving_sequence, roundtrip_sequence
    seq = moving_sequence(frames=4)
    sizes = {}
    for cont in (False, True):
        params = EncoderParams(inter_prediction=True,
                               random_access_period=8,
                               inter_entropy_continuation=cont)
        outs, sizes[cont] = roundtrip_sequence(seq, params)
        assert len(outs) == 4
        for src, out in zip(seq, outs):
            np.testing.assert_array_equal(
                np.sort(morton.encode(out.positions)),
                np.unique(morton.encode(src.positions)))
    assert sizes[True] < sizes[False]


def test_axis_order_roundtrip():
    c = cloud(n=1500, seed=8)
    for order in hls.AxisOrder:
        params = EncoderParams(axis_order=order)
        bufs = encode_payloads(c, params)
        outs = decode_payloads(bufs)
        np.testing.assert_array_equal(
            np.sort(morton.encode(outs[0].positions)),
            np.unique(morton.encode(c.positions)))


def test_attr_scale_offset():
    rng = np.random.default_rng(11)
    pos = rng.integers(0, 512, (800, 3), dtype=np.int64)
    # 16-bit reflectance quantised to 8 bits via attrScale=256
    refl = (rng.integers(0, 256, 800) * 256).astype(np.uint16)
    c = PointCloud(pos, reflectances=refl)
    params = EncoderParams(attributes=[
        AttributeConfig("reflectance", 8, hls.AttributeEncoding.PRED,
                        qp=4, attr_scale=256)])
    bufs = encode_payloads(c, params)
    outs = decode_payloads(bufs)
    got = np.sort(outs[0].reflectances)
    np.testing.assert_array_equal(got, np.sort(refl))


def test_raw_attribute_out_of_range_raises():
    """RAW values outside [0, 2**bitdepth) must raise at encode time
    instead of silently wrapping (advisor finding r1)."""
    import numpy as np
    import pytest
    from mpeg_pcc_tmc13_tpu.bitstream.hls import AttributeDescription
    from mpeg_pcc_tmc13_tpu.models.attributes import encode_raw
    desc = AttributeDescription(label="reflectance", num_components=1,
                                bitdepth=8)
    with pytest.raises(ValueError, match="out of range"):
        encode_raw(np.array([-3, 5]), desc)
    with pytest.raises(ValueError, match="out of range"):
        encode_raw(np.array([256]), desc)


def test_obuf_truncated_stream_no_crash():
    """Truncated OBUF payloads must fail cleanly (capacity error) or
    produce a bounded point set — never crash or overrun."""
    from mpeg_pcc_tmc13_tpu.bitstream import hls
    from mpeg_pcc_tmc13_tpu.models import geometry_obuf
    rng = np.random.default_rng(1)
    pos = np.unique(rng.integers(0, 128, (3000, 3)).astype(np.int64),
                    axis=0)
    gps = hls.GeometryParameterSet(planar_mode_enabled=True)
    payload = geometry_obuf.encode(pos, 7, None, gps)
    for frac in (0.75, 0.5, 0.25, 0.05):
        cut = payload[:int(len(payload) * frac)]
        try:
            out = geometry_obuf.decode(cut, pos.shape[0], 7, None, gps)
            assert out.shape[0] <= pos.shape[0]
        except RuntimeError:
            pass   # clean capacity/desync error
