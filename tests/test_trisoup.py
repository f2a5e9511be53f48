"""Trisoup geometry codec + recolouring tests."""

import io

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy, hls
from mpeg_pcc_tmc13_tpu.models import geometry_octree, geometry_trisoup
from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
from mpeg_pcc_tmc13_tpu.ops import recolour as recolour_ops
from mpeg_pcc_tmc13_tpu.ops import trisoup as trisoup_ops
from mpeg_pcc_tmc13_tpu.utils import morton


def surface_cloud(n, depth, seed=0):
    """Smooth height-field surface — the workload trisoup targets."""
    rng = np.random.default_rng(seed)
    size = 1 << depth
    xy = rng.integers(0, size, (n, 2))
    z = (size / 2 + (size / 4) * np.sin(2 * np.pi * xy[:, 0] / size)
         * np.cos(2 * np.pi * xy[:, 1] / size)).astype(np.int64)
    pos = np.column_stack([xy[:, 0], xy[:, 1], np.clip(z, 0, size - 1)])
    return morton.decode(np.unique(morton.encode(pos)))


def chamfer_1way(a, b):
    """max over a of min distance to b (small sample for speed)."""
    sample = a[:: max(1, len(a) // 500)]
    d = sample[:, None, :] - b[None, :, :]
    return np.sqrt((d * d).sum(-1).min(axis=1)).max()


def test_edge_keys_shared_between_neighbors():
    # two nodes adjacent along x share 4 edges
    codes = morton.encode(np.array([[0, 0, 0], [1, 0, 0]], dtype=np.int64))
    keys, _ = trisoup_ops.edge_keys_for_nodes(np.sort(codes), 2)
    uniq, inv = trisoup_ops.unique_edges(keys)
    assert uniq.shape[0] == 24 - 4


def test_trisoup_roundtrip_stream():
    depth, s = 7, 2
    pos = surface_cloud(4000, depth, seed=1)
    enc = entropy.RangeEncoder()
    octx = geometry_octree.OctreeContexts()
    tctx = geometry_trisoup.TrisoupContexts()
    recon_enc = geometry_trisoup.encode(pos, depth, s, enc, octx, tctx)
    data = enc.get_bytes()

    dec = entropy.RangeDecoder(data)
    recon_dec = geometry_trisoup.decode(
        depth, s, dec, geometry_octree.OctreeContexts(),
        geometry_trisoup.TrisoupContexts(), max_nodes=len(pos))
    # decoder reproduces the encoder-side reconstruction exactly
    np.testing.assert_array_equal(recon_enc, recon_dec)
    assert recon_dec.shape[0] > 0
    # surface distortion bounded by ~node size
    assert chamfer_1way(pos, recon_dec) <= (1 << s) * 2
    # compressed below octree-lossless size at full depth
    assert len(data) < len(pos) * 2


def test_trisoup_full_pipeline_with_attrs():
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams,
                                                    FrameEncoder)
    depth = 7
    pos = surface_cloud(3000, depth, seed=2)
    rng = np.random.default_rng(3)
    colors = rng.integers(0, 256, (len(pos), 3)).astype(np.uint16)
    cloud = PointCloud(pos, colors)
    params = EncoderParams(
        geometry_codec=hls.GeometryCodecType.TRISOUP,
        trisoup_node_size_log2=2,
        attributes=[AttributeConfig("color", 8,
                                    hls.AttributeEncoding.RAHT, qp=10)])
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    enc.compress(cloud, lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for buf in iter_tlv(bs):
        dec.decompress(buf)
    dec.flush()
    assert len(outs) == 1
    out = outs[0]
    assert out.count > 0
    assert out.colors is not None and out.colors.shape == (out.count, 3)
    assert chamfer_1way(pos, out.positions) <= 8


def test_recolour_exact_on_identical_positions():
    rng = np.random.default_rng(4)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 64, (500, 3), dtype=np.int64))))
    colors = rng.integers(0, 256, (len(pos), 3)).astype(np.uint16)
    src = PointCloud(pos, colors)
    out = recolour_ops.recolour(src, pos)
    np.testing.assert_array_equal(out.colors, colors)


def test_recolour_nearest_on_shifted_positions():
    rng = np.random.default_rng(5)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 64, (500, 3), dtype=np.int64) * 4)))
    refl = (pos[:, 0] * 3).astype(np.uint16)
    src = PointCloud(pos, reflectances=refl)
    # targets shifted by 1 voxel: nearest source is the original point
    out = recolour_ops.recolour(src, pos + np.array([1, 0, 0]))
    err = np.abs(out.reflectances.astype(int) - refl.astype(int))
    assert np.median(err) <= 6
