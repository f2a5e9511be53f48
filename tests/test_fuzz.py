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
