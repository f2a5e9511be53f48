import io

from mpeg_pcc_tmc13_tpu.bitstream.tlv import (
    PayloadBuffer, PayloadType, iter_tlv, write_tlv)


def test_tlv_roundtrip():
    bufs = [
        PayloadBuffer(PayloadType.SEQUENCE_PARAMETER_SET, b"\x01\x02"),
        PayloadBuffer(PayloadType.GEOMETRY_BRICK, b"\x00" * 1000),
        PayloadBuffer(PayloadType.FRAME_BOUNDARY_MARKER, b""),
    ]
    f = io.BytesIO()
    for b in bufs:
        write_tlv(b, f)
    f.seek(0)
    out = list(iter_tlv(f))
    assert [(b.type, b.data) for b in out] == [(b.type, b.data) for b in bufs]


def test_user_data_roundtrip():
    """UserData units (reference hls.h:1041) survive the pipeline and
    are surfaced on the decoder."""
    import io

    import numpy as np

    from mpeg_pcc_tmc13_tpu.bitstream import hls
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    rng = np.random.default_rng(2)
    pos = rng.integers(0, 128, (500, 3), dtype=np.int64)
    ud = hls.UserData(oid=(1, 3, 6, 1), payload=b"hello pcc")
    enc = FrameEncoder(EncoderParams(user_data=ud))
    bs = io.BytesIO()
    enc.compress(PointCloud(pos), lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for buf in iter_tlv(bs):
        dec.decompress(buf)
    dec.flush()
    assert len(outs) == 1 and outs[0].count > 0
    assert len(dec.user_data) == 1
    assert dec.user_data[0].oid == (1, 3, 6, 1)
    assert dec.user_data[0].payload == b"hello pcc"
