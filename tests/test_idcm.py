"""IDCM (inferred direct coding mode) tests."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
from mpeg_pcc_tmc13_tpu.ops import octree as ops
from mpeg_pcc_tmc13_tpu.utils import morton


def sparse_cloud(n, depth, seed=0):
    """Very sparse: most nodes become isolated chains -> IDCM fires."""
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    return morton.decode(np.unique(morton.encode(pos)))


@pytest.mark.parametrize("mode", [ops.CTX_MODE_PARENT, ops.CTX_MODE_NEIGH])
@pytest.mark.parametrize("n,depth", [(50, 12), (2000, 10), (20000, 14)])
def test_idcm_roundtrip(mode, n, depth):
    pos = sparse_cloud(n, depth, seed=n + depth)
    enc = entropy.RangeEncoder()
    go.encode(pos, depth, enc, go.OctreeContexts(),
              ctx_mode=mode, idcm=True)
    data = enc.get_bytes()
    dec = entropy.RangeDecoder(data)
    out = go.decode(len(pos), depth, dec, go.OctreeContexts(),
                    ctx_mode=mode, idcm=True)
    np.testing.assert_array_equal(out, pos)


def test_idcm_shrinks_sparse_streams():
    depth = 16
    pos = sparse_cloud(5000, depth, seed=3)
    sizes = {}
    for idcm in (False, True):
        enc = entropy.RangeEncoder()
        go.encode(pos, depth, enc, go.OctreeContexts(),
                  ctx_mode=ops.CTX_MODE_PARENT, idcm=idcm)
        sizes[idcm] = len(enc.get_bytes())
    assert sizes[True] < sizes[False]


def test_idcm_scalable_decode_keeps_idcm_points_exact():
    depth = 12
    pos = sparse_cloud(800, depth, seed=4)
    enc = entropy.RangeEncoder()
    go.encode(pos, depth, enc, go.OctreeContexts(), idcm=True,
              ctx_mode=ops.CTX_MODE_PARENT)
    dec = entropy.RangeDecoder(enc.get_bytes())
    out = go.decode(len(pos), depth, dec, go.OctreeContexts(),
                    idcm=True, ctx_mode=ops.CTX_MODE_PARENT,
                    skip_layers=3)
    # every exact source point that was IDCM-coded appears verbatim
    src = set(map(tuple, pos))
    exact = sum(tuple(p) in src for p in out)
    assert exact > 0
    assert out.shape[0] > 0


def test_idcm_full_pipeline():
    import io
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    pos = sparse_cloud(3000, 13, seed=5)
    bs = io.BytesIO()
    FrameEncoder(EncoderParams(idcm=True)).compress(
        PointCloud(pos), lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    np.testing.assert_array_equal(
        np.sort(morton.encode(outs[0].positions)),
        morton.encode(pos))
