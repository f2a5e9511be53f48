"""Decoder robustness: random/corrupt inputs must not crash or hang.

The native decoder zero-fills past the end of the buffer (entropy.cc
next_byte), so any garbage stream decodes to *something* bounded.
"""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
from mpeg_pcc_tmc13_tpu.ops import octree as ops


@pytest.mark.parametrize("seed", range(5))
def test_octree_decode_random_bytes(seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
    dec = entropy.RangeDecoder(data)
    # capacity bound protects against exponential blowup: decode must
    # either return <= cap points or raise the capacity error
    try:
        out = go.decode(5000, 8, dec, go.OctreeContexts(),
                        ctx_mode=ops.CTX_MODE_PARENT)
        assert out.shape[0] <= 8 ** 8
    except ValueError:
        pass


@pytest.mark.parametrize("seed", range(3))
def test_residual_decode_random_bytes(seed):
    rng = np.random.default_rng(seed + 10)
    data = rng.integers(0, 256, 500, dtype=np.uint8).tobytes()
    dec = entropy.RangeDecoder(data)
    ctx = entropy.new_contexts(32)
    vals = dec.resbl(ctx, 1000)
    assert vals.shape == (1000,)
    vals2 = dec.residuals(ctx, 500, 3, 2)
    assert vals2.shape == (500,)


def test_corrupt_geometry_brick_payload():
    from mpeg_pcc_tmc13_tpu.bitstream import hls
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import PayloadBuffer, PayloadType
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    rng = np.random.default_rng(1)
    cloud = PointCloud(rng.integers(0, 256, (500, 3), dtype=np.int64))
    bufs = []
    FrameEncoder(EncoderParams()).compress(cloud, bufs.append)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in bufs:
        if b.type == PayloadType.GEOMETRY_BRICK:
            # flip bytes in the middle of the entropy stream
            data = bytearray(b.data)
            mid = len(data) // 2
            for i in range(mid, min(mid + 16, len(data))):
                data[i] ^= 0xA5
            b = PayloadBuffer(b.type, bytes(data))
        try:
            dec.decompress(b)
        except (ValueError, AssertionError):
            pass
    dec.flush()  # must not raise


def test_random_config_roundtrips():
    """Property test: random encoder configurations must round-trip —
    geometry set-exact (lossless configs) and decodable (all configs).
    Guards the encode/decode dispatch gates (planar/IDCM/inter/QTBT/
    coder selection must match exactly on both sides)."""
    import io

    from mpeg_pcc_tmc13_tpu.bitstream import hls
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams,
                                                    FrameEncoder)
    from mpeg_pcc_tmc13_tpu.utils import morton
    rng = np.random.default_rng(2026)
    for trial in range(12):
        n = int(rng.integers(200, 4000))
        depth_max = int(rng.integers(6, 10))
        pos = rng.integers(0, 1 << depth_max, (n, 3), dtype=np.int64)
        attrs = []
        if rng.random() < 0.7:
            attrs.append(AttributeConfig(
                "reflectance", 16,
                [hls.AttributeEncoding.RAHT, hls.AttributeEncoding.PRED,
                 hls.AttributeEncoding.LIFT][int(rng.integers(3))],
                qp=int(rng.integers(4, 35)),
                scalable_lifting=bool(rng.random() < 0.3),
                last_component_prediction=bool(rng.random() < 0.3)))
        geom = (hls.GeometryCodecType.PREDICTIVE
                if rng.random() < 0.25
                else hls.GeometryCodecType.OCTREE)
        params = EncoderParams(
            geometry_codec=geom,
            engine=("obuf" if rng.random() < 0.3 else "auto"),
            planar_enabled=bool(rng.random() < 0.4),
            idcm=bool(rng.random() < 0.3),
            bytewise_occupancy=bool(rng.random() < 0.7),
            neighbour_context=bool(rng.random() < 0.5),
            inter_prediction=bool(rng.random() < 0.4),
            lpu_motion=bool(rng.random() < 0.3),
            lpu_type=int(rng.integers(2)),
            num_entropy_streams=int(rng.integers(1, 3)),
            attributes=attrs)
        refl = (pos[:, 0] % 255).astype(np.uint16)
        frames = [PointCloud(pos, reflectances=refl if attrs else None)]
        if params.inter_prediction:
            p2 = np.clip(pos + rng.integers(-2, 3, pos.shape), 0, None)
            frames.append(PointCloud(
                p2, reflectances=(p2[:, 0] % 255).astype(np.uint16)
                if attrs else None))
        bs = io.BytesIO()
        enc = FrameEncoder(params)
        for c in frames:
            enc.compress(c, lambda b: write_tlv(b, bs))
        bs.seek(0)
        outs = []
        dec = FrameDecoder(outs.append)
        for b in iter_tlv(bs):
            dec.decompress(b)
        dec.flush()
        assert len(outs) == len(frames), f"trial {trial}: {params}"
        for c, out in zip(frames, outs):
            np.testing.assert_array_equal(
                np.sort(morton.encode(out.positions.astype(np.int64))),
                np.unique(morton.encode(c.positions)),
                err_msg=f"trial {trial}: {params}")
