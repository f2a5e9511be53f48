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
