"""Octree geometry codec round-trip tests (numpy + jax device paths)."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
from mpeg_pcc_tmc13_tpu.ops import octree as ops
from mpeg_pcc_tmc13_tpu.utils import morton


def random_cloud(n, depth, seed=0, dups=False):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    if dups:
        extra = pos[rng.integers(0, n, size=n // 3)]
        pos = np.concatenate([pos, extra])
    return pos


def sorted_unique_positions(pos):
    codes = np.unique(morton.encode(pos))
    return morton.decode(codes)


@pytest.mark.parametrize("depth", [1, 4, 10])
@pytest.mark.parametrize("n", [1, 100, 5000])
def test_roundtrip_unique(depth, n):
    pos = random_cloud(n, depth, seed=depth * 100 + n)
    enc = entropy.RangeEncoder()
    ectx = go.OctreeContexts()
    go.encode(pos, depth, enc, ectx, unique_points=True)
    data = enc.get_bytes()

    dec = entropy.RangeDecoder(data)
    dctx = go.OctreeContexts()
    out = go.decode(len(np.unique(morton.encode(pos))), depth, dec, dctx)
    np.testing.assert_array_equal(out, sorted_unique_positions(pos))


def test_roundtrip_duplicates():
    depth = 8
    pos = random_cloud(2000, depth, seed=7, dups=True)
    enc = entropy.RangeEncoder()
    go.encode(pos, depth, enc, go.OctreeContexts(), unique_points=False)
    data = enc.get_bytes()
    dec = entropy.RangeDecoder(data)
    out = go.decode(len(pos), depth, dec, go.OctreeContexts(),
                    unique_points=False)
    codes = np.sort(morton.encode(pos))
    np.testing.assert_array_equal(out, morton.decode(codes))


def test_device_analysis_matches_numpy():
    import jax.numpy as jnp
    depth = 6
    pos = random_cloud(3000, depth, seed=3)
    uniq = np.unique(morton.encode(pos))
    levels = ops.build_levels_np(uniq, depth)
    res = ops.encode_analysis_jax(jnp.asarray(uniq), depth)
    occ = np.asarray(res["occ"])
    base = np.asarray(res["ctx_base"])
    mask = np.asarray(res["node_mask"])
    code = np.asarray(res["node_code"])
    for l in range(depth):
        m = mask[l]
        np.testing.assert_array_equal(code[l][m], levels[l]["nodes"])
        np.testing.assert_array_equal(occ[l][m], levels[l]["occ"])
        np.testing.assert_array_equal(base[l][m], levels[l]["ctx_base"])


@pytest.mark.parametrize("mode", [ops.CTX_MODE_NEIGH, ops.CTX_MODE_PARENT])
def test_engines_emit_identical_bitstreams(mode):
    depth = 7
    pos = random_cloud(4000, depth, seed=11)
    streams = {}
    for engine in ("numpy", "native", "device"):
        enc = entropy.RangeEncoder()
        go.encode(pos, depth, enc, go.OctreeContexts(),
                  engine=engine, ctx_mode=mode)
        streams[engine] = enc.get_bytes()
    assert streams["numpy"] == streams["native"] == streams["device"]
    # native and numpy decoders both recover the cloud from the stream
    expect = sorted_unique_positions(pos)
    for engine in ("numpy", "native"):
        dec = entropy.RangeDecoder(streams["numpy"])
        out = go.decode(len(pos), depth, dec, go.OctreeContexts(),
                        engine=engine, ctx_mode=mode)
        np.testing.assert_array_equal(out, expect)


def test_encode_order_aligns_attributes():
    depth = 5
    pos = random_cloud(500, depth, seed=9)
    enc = entropy.RangeEncoder()
    order = go.encode(pos, depth, enc, go.OctreeContexts())
    dec = entropy.RangeDecoder(enc.get_bytes())
    out = go.decode(len(pos), depth, dec, go.OctreeContexts())
    # positions reordered by `order` == decoded positions (when unique)
    uniq_mask = np.concatenate(
        [[True], np.diff(np.sort(morton.encode(pos))) != 0])
    np.testing.assert_array_equal(pos[order][uniq_mask], out)


class TestPlanarMode:
    """Planar mode (reference planar coding tools): per-axis half-plane
    flags with level-causal eligibility + masked occupancy symbols."""

    @staticmethod
    def _surface(n=15000, depth=9, seed=7):
        rng = np.random.default_rng(seed)
        size = 1 << depth
        xy = rng.integers(0, size, (n, 2))
        z = (size / 2 + (size / 4) * np.sin(2 * np.pi * xy[:, 0] / size)
             * np.cos(2 * np.pi * xy[:, 1] / size)).astype(np.int64)
        return np.column_stack([xy[:, 0], xy[:, 1],
                                np.clip(z, 0, size - 1)])

    @pytest.mark.parametrize("mode", [ops.CTX_MODE_PARENT,
                                      ops.CTX_MODE_NEIGH])
    def test_roundtrip_and_saving(self, mode):
        pos = self._surface()
        expect = morton.decode(np.unique(morton.encode(pos)))
        sizes = {}
        for planar in (False, True):
            enc = entropy.RangeEncoder()
            go.encode(pos, 9, enc, go.OctreeContexts(), ctx_mode=mode,
                      planar=planar, engine="numpy")
            data = enc.get_bytes()
            sizes[planar] = len(data)
            out = go.decode(len(pos), 9, entropy.RangeDecoder(data),
                            go.OctreeContexts(), ctx_mode=mode,
                            planar=planar, engine="numpy")
            np.testing.assert_array_equal(out, expect)
        assert sizes[True] < sizes[False] * 0.99   # real saving

    def test_duplicates(self):
        pos = np.repeat(self._surface(2000, 8), 2, axis=0)
        enc = entropy.RangeEncoder()
        go.encode(pos, 8, enc, go.OctreeContexts(), planar=True,
                  unique_points=False, engine="numpy")
        out = go.decode(len(pos), 8, entropy.RangeDecoder(enc.get_bytes()),
                        go.OctreeContexts(), planar=True,
                        unique_points=False, engine="numpy")
        srt = np.sort(morton.encode(pos), kind="stable")
        np.testing.assert_array_equal(morton.encode(out), srt)

    def test_skip_layers(self):
        pos = self._surface(5000, 8)
        enc = entropy.RangeEncoder()
        go.encode(pos, 8, enc, go.OctreeContexts(), planar=True,
                  engine="numpy")
        out = go.decode(len(pos), 8, entropy.RangeDecoder(enc.get_bytes()),
                        go.OctreeContexts(), planar=True,
                        skip_layers=2, engine="numpy")
        assert out.shape[0] > 0
        # coarse centres: within half a 4-voxel cell of some true point
        uniq = morton.decode(np.unique(morton.encode(pos)))
        d = np.abs(out[:, None, :] - uniq[None, ::7, :]).sum(-1)
        assert out.shape[0] < uniq.shape[0]

    def test_cli_planar_flag(self, tmp_path):
        from mpeg_pcc_tmc13_tpu.runtime import cli
        from mpeg_pcc_tmc13_tpu.utils import ply
        pos = self._surface(6000, 9).astype(np.float64)
        in_ply = tmp_path / "in.ply"
        ply.write(ply.PlyCloud(positions=pos), str(in_ply),
                  position_is_float=False)
        sizes = {}
        for tag, flag in (("off", "0"), ("on", "1")):
            bs = tmp_path / f"{tag}.bin"
            assert cli.main([
                "--mode=0", f"--uncompressedDataPath={in_ply}",
                f"--compressedStreamPath={bs}",
                f"--planarEnabled={flag}",
                "--disableAttributeCoding=1"]) == 0
            rec = tmp_path / f"{tag}.ply"
            assert cli.main(["--mode=1", f"--compressedStreamPath={bs}",
                             f"--reconstructedDataPath={rec}"]) == 0
            got = ply.read(str(rec)).positions.astype(np.int64)
            srt = np.unique(morton.encode(pos.astype(np.int64)))
            np.testing.assert_array_equal(
                np.sort(morton.encode(got)), srt)
            sizes[tag] = bs.stat().st_size
        assert sizes["on"] < sizes["off"]


class TestImplicitQtbt:
    """Implicit QT/BT (reference implicit geometry partitions): axes
    exhausted at the top levels code no child slots, derived from the
    GBH per-axis root sizes with zero signalling."""

    def test_roundtrip_and_saving(self):
        rng = np.random.default_rng(18)
        pos = np.column_stack([
            rng.integers(0, 1024, 20000), rng.integers(0, 1024, 20000),
            rng.integers(0, 16, 20000)]).astype(np.int64)
        expect = morton.decode(np.unique(morton.encode(pos)))
        sizes = {}
        for ab in (None, (10, 10, 4)):
            enc = entropy.RangeEncoder()
            go.encode(pos, 10, enc, go.OctreeContexts(), engine="numpy",
                      ctx_mode=ops.CTX_MODE_PARENT, axis_bits=ab)
            data = enc.get_bytes()
            sizes[ab is not None] = len(data)
            out = go.decode(len(pos), 10, entropy.RangeDecoder(data),
                            go.OctreeContexts(), engine="numpy",
                            ctx_mode=ops.CTX_MODE_PARENT, axis_bits=ab)
            np.testing.assert_array_equal(out, expect)
        assert sizes[True] < sizes[False]

    def test_codec_level_flat_cloud(self, tmp_path):
        from mpeg_pcc_tmc13_tpu.runtime import cli
        from mpeg_pcc_tmc13_tpu.utils import ply
        rng = np.random.default_rng(19)
        pos = np.column_stack([
            rng.integers(0, 512, 5000), rng.integers(0, 512, 5000),
            rng.integers(0, 8, 5000)]).astype(np.float64)
        in_ply = tmp_path / "in.ply"
        ply.write(ply.PlyCloud(positions=pos), str(in_ply),
                  position_is_float=False)
        bs, rec = tmp_path / "o.bin", tmp_path / "r.ply"
        assert cli.main(["--mode=0", f"--uncompressedDataPath={in_ply}",
                         f"--compressedStreamPath={bs}",
                         "--disableAttributeCoding=1"]) == 0
        assert cli.main(["--mode=1", f"--compressedStreamPath={bs}",
                         f"--reconstructedDataPath={rec}"]) == 0
        got = ply.read(str(rec)).positions.astype(np.int64)
        np.testing.assert_array_equal(
            np.sort(morton.encode(got)),
            np.unique(morton.encode(pos.astype(np.int64))))
        # the GBH carries the non-cubic axis sizes
        from mpeg_pcc_tmc13_tpu.bitstream import hls as _h
        from mpeg_pcc_tmc13_tpu.bitstream.tlv import PayloadType, iter_tlv
        for buf in iter_tlv(open(bs, "rb")):
            if buf.type == PayloadType.GEOMETRY_BRICK:
                gbh, _ = _h.GeometryBrickHeader.parse(buf.data)
                assert gbh.axis_bits[2] < gbh.axis_bits[0]
                break


def test_per_node_geometry_qp_roundtrip():
    """Per-node geometry QP at a signalled octree depth (reference
    positionQuantisationOctreeDepth): dense nodes code on a coarser
    grid; the decoder recentres them from the signalled shifts."""
    import io

    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import EncoderParams, \
        FrameEncoder

    rng = np.random.default_rng(17)
    # a dense clump + sparse field: density-adaptive shifts trigger
    clump = rng.integers(100, 140, (30000, 3))
    sparse = rng.integers(0, 512, (4000, 3))
    pos = np.unique(np.concatenate([clump, sparse]), axis=0)

    def run(depth_opt):
        params = EncoderParams(geom_qp_octree_depth=depth_opt)
        bs = io.BytesIO()
        enc = FrameEncoder(params)
        enc.compress(PointCloud(pos.copy()), lambda b: write_tlv(b, bs))
        outs = []
        dec = FrameDecoder(outs.append)
        bs.seek(0)
        for buf in iter_tlv(bs):
            dec.decompress(buf)
        dec.flush()
        return outs[0].positions.astype(np.int64), bs.getbuffer().nbytes

    rec0, size0 = run(0)
    assert np.array_equal(np.unique(rec0, axis=0), pos)  # lossless

    rec1, size1 = run(3)
    assert size1 < size0                  # coarser clump -> fewer bits
    # bounded error: recentred within half of the max shift cell
    from mpeg_pcc_tmc13_tpu.ops.recolour import knn
    _, d2 = knn(rec1, pos, k=1)
    assert float(d2.max()) <= 3 * (2 ** 2) ** 2


def test_obuf_scalable_skip_layers():
    """OBUF bricks support scalable truncation: the last layers are
    not decoded and node centres come back at full resolution
    (refcodec tmc13ref_decode_octree_scalable)."""
    from mpeg_pcc_tmc13_tpu.bitstream import hls
    from mpeg_pcc_tmc13_tpu.models import geometry_obuf
    rng = np.random.default_rng(5)
    pos = np.unique(rng.integers(0, 256, (6000, 3)).astype(np.int64),
                    axis=0)
    gps = hls.GeometryParameterSet(planar_mode_enabled=True)
    payload = geometry_obuf.encode(pos, 8, None, gps)
    for skip in (1, 3):
        part = geometry_obuf.decode(payload, pos.shape[0], 8, None,
                                    gps, skip_layers=skip)
        got = np.unique(morton.encode(part) >> (3 * skip))
        want = np.unique(morton.encode(pos) >> (3 * skip))
        np.testing.assert_array_equal(got, want)
