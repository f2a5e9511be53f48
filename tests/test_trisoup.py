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


def test_trisoup_face_vertices_roundtrip():
    """Face vertices on: stream decodes bit-exactly and distortion does
    not regress vs the node-size bound."""
    depth, s = 7, 3
    pos = surface_cloud(4000, depth, seed=6)
    enc = entropy.RangeEncoder()
    recon_enc = geometry_trisoup.encode(
        pos, depth, s, enc, geometry_octree.OctreeContexts(),
        geometry_trisoup.TrisoupContexts(), face_vertices=True)
    data = enc.get_bytes()

    dec = entropy.RangeDecoder(data)
    recon_dec = geometry_trisoup.decode(
        depth, s, dec, geometry_octree.OctreeContexts(),
        geometry_trisoup.TrisoupContexts(), max_nodes=len(pos),
        face_vertices=True)
    np.testing.assert_array_equal(recon_enc, recon_dec)
    assert chamfer_1way(pos, recon_dec) <= (1 << s) * 2

    # the v2 surface model accepts the flag for option compatibility
    # without altering the stream (face vertices are subsumed by the
    # centroid-drift + two-axis ray model)
    enc2 = entropy.RangeEncoder()
    geometry_trisoup.encode(
        pos, depth, s, enc2, geometry_octree.OctreeContexts(),
        geometry_trisoup.TrisoupContexts(), face_vertices=False)
    assert enc2.get_bytes() == data


def test_trisoup_face_vertex_cli_flag(tmp_path):
    from mpeg_pcc_tmc13_tpu.runtime import cli
    from mpeg_pcc_tmc13_tpu.utils import ply
    pos = surface_cloud(2500, 7, seed=7).astype(np.float64)
    in_ply = tmp_path / "in.ply"
    ply.write(ply.PlyCloud(positions=pos), str(in_ply),
              position_is_float=False)
    out_bin = tmp_path / "o.bin"
    rec_ply = tmp_path / "r.ply"
    assert cli.main([f"--uncompressedDataPath={in_ply}",
                     f"--compressedStreamPath={out_bin}", "--mode=0",
                     "--trisoupNodeSizeLog2=3",
                     "--trisoupFaceVertexEnabled=1",
                     "--disableAttributeCoding=1"]) == 0
    # flag must land in the GPS
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import PayloadType, iter_tlv
    with open(out_bin, "rb") as f:
        for buf in iter_tlv(f):
            if buf.type == PayloadType.GEOMETRY_PARAMETER_SET:
                g = hls.GeometryParameterSet.parse(buf.data)
                assert g.trisoup_face_vertex_enabled is True
                break
        else:
            raise AssertionError("no GPS in stream")
    assert cli.main(["--mode=1", f"--compressedStreamPath={out_bin}",
                     f"--reconstructedDataPath={rec_ply}"]) == 0
    rec = ply.read(str(rec_ply))
    assert rec.count > 0
    assert chamfer_1way(pos.astype(np.int64),
                        rec.positions.astype(np.int64)) <= 16


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


def test_trisoup_halo():
    """Halo (reference trisoup_halo_flag): thickens voxelised
    triangles so adjacent-node fans seal; decoder matches encoder
    exactly and the reconstruction gets denser."""
    depth, s = 7, 3
    pos = surface_cloud(4000, depth, seed=8)
    recs = {}
    for halo in (False, True):
        enc = entropy.RangeEncoder()
        rec = geometry_trisoup.encode(
            pos, depth, s, enc, geometry_octree.OctreeContexts(),
            geometry_trisoup.TrisoupContexts(), halo=halo)
        dec = entropy.RangeDecoder(enc.get_bytes())
        rec2 = geometry_trisoup.decode(
            depth, s, dec, geometry_octree.OctreeContexts(),
            geometry_trisoup.TrisoupContexts(), max_nodes=len(pos),
            halo=halo)
        np.testing.assert_array_equal(rec, rec2)
        recs[halo] = rec
    # v2 semantics: the halo widens triangles only on sub-sampled
    # passes (reference haloTriangle, rayTracingAlongdirection :1393);
    # at sampling 1 both settings reconstruct identically, and either
    # way the surface distortion stays within the node-size bound
    for rec in recs.values():
        assert chamfer_1way(pos, rec) <= (1 << s) * 2


def test_multislice_seam():
    """Trisoup slice padding (reference pointIndexesPadding,
    encoder.cpp:480-494) + boundary clipping must keep multi-slice
    reconstruction quality close to single-slice — no cracks at the
    slice border."""
    import io

    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.ops.recolour import knn
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import EncoderParams, \
        FrameEncoder

    rng = np.random.default_rng(9)
    side = 220
    xs = rng.integers(0, 256, side * side)
    ys = rng.integers(0, 256, side * side)
    zs = ((np.sin(xs / 40.0) + np.cos(ys / 31.0) + 2.2)
          * 50).astype(np.int64)
    pos = np.unique(np.stack([xs, ys, zs], axis=1), axis=0)

    def run(max_pts):
        params = EncoderParams(trisoup_node_size_log2=3,
                               geometry_codec=None,
                               max_points_per_slice=max_pts)
        params.geometry_codec = \
            __import__("mpeg_pcc_tmc13_tpu.bitstream.hls",
                       fromlist=["hls"]).GeometryCodecType.TRISOUP
        bs = io.BytesIO()
        enc = FrameEncoder(params)
        enc.compress(PointCloud(pos.copy()), lambda b: write_tlv(b, bs))
        outs = []
        dec = FrameDecoder(outs.append)
        bs.seek(0)
        for buf in iter_tlv(bs):
            dec.decompress(buf)
        dec.flush()
        rec = outs[0].positions.astype(np.int64)
        _, d2 = knn(rec, pos, k=1)
        return float(d2.mean()), rec

    err_single, _ = run(10_000_000)
    err_multi, rec = run(pos.shape[0] // 3 + 1)
    # multi-slice must not crack: mean sq err within 25% of single
    assert err_multi <= err_single * 1.25 + 0.05


def test_trisoup_sparse_random_capacity():
    """Sparse random content: trisoup node count can exceed the
    reconstruction count; the signalled capacity must cover the
    octree decode (regression for the ctc_matrix multislice config)."""
    import io
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams,
                                                    FrameEncoder)
    rng = np.random.default_rng(42)
    pos = rng.integers(0, 1 << 10, (20000, 3)).astype(np.int64)
    cols = rng.integers(0, 256, (20000, 3)).astype(np.int64)
    p = EncoderParams(trisoup_node_size_log2=3, max_points_per_slice=6000,
                      attributes=[AttributeConfig(label="color", qp=22)])
    bs = io.BytesIO()
    enc = FrameEncoder(p)
    enc.compress(PointCloud(pos, cols), lambda b: write_tlv(b, bs))
    enc.flush(lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    assert outs and outs[0].count > 0


def test_trisoup_obuf_reference_exact_brick():
    """With --geomEngine=obuf the trisoup brick rides the
    reference-exact coder (octree phase + trained dynamic-OBUF vertex
    maps + centroid/face stages in one embedded dirac payload,
    models/geometry_trisoup._encode_ref).  The decoder must reproduce
    the encoder-side reconstruction exactly, and the trained vertex
    contexts must beat the v2 coder on surface content."""
    import io
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    depth = 9
    pos = surface_cloud(60_000, depth, seed=3)

    def run(params):
        bs = io.BytesIO()
        enc = FrameEncoder(params)
        enc.compress(PointCloud(pos), lambda b: write_tlv(b, bs))
        bs.seek(0)
        outs = []
        dec = FrameDecoder(outs.append)
        for b in iter_tlv(bs):
            dec.decompress(b)
        dec.flush()
        return outs[0].positions.astype(np.int64), bs.getbuffer().nbytes

    rec_ref, bytes_ref = run(EncoderParams(
        trisoup_node_size_log2=2, engine="obuf", planar_enabled=True))
    rec_v2, bytes_v2 = run(EncoderParams(trisoup_node_size_log2=2))
    # reference path: decoder == encoder recon (already asserted inside
    # _decode_ref via expected_points; verify surface quality too)
    assert rec_ref.shape[0] > 0
    assert chamfer_1way(pos, rec_ref) <= (1 << 2) * 2
    # trained contexts + reference surface model: fewer bytes than the
    # v2 path on smooth surfaces
    assert bytes_ref < bytes_v2
