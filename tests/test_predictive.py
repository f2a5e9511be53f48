"""Predictive geometry (chain) codec tests."""

import io

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy, hls
from mpeg_pcc_tmc13_tpu.models import geometry_predictive as gp
from mpeg_pcc_tmc13_tpu.utils import morton


def lidar_like_cloud(n, seed=0):
    """Azimuth-sweeping ring pattern, like a spinning LiDAR frame."""
    rng = np.random.default_rng(seed)
    az = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = 2000 + 500 * np.sin(az * 5) + rng.normal(0, 10, n)
    z = 100 * np.sin(az * 3) + rng.normal(0, 5, n)
    pos = np.column_stack([r * np.cos(az), r * np.sin(az), z])
    return np.round(pos).astype(np.int64) + 4096


@pytest.mark.parametrize("sort_mode", [gp.SortMode.NONE, gp.SortMode.MORTON,
                                       gp.SortMode.AZIMUTH])
def test_roundtrip_lossless(sort_mode):
    pos = lidar_like_cloud(5000, seed=1)
    enc = entropy.RangeEncoder()
    ectx = gp.PredGeomContexts()
    order = gp.encode(pos, enc, ectx, sort_mode=sort_mode)
    data = enc.get_bytes()
    dec = entropy.RangeDecoder(data)
    out = gp.decode(len(pos), dec, gp.PredGeomContexts())
    np.testing.assert_array_equal(out, pos[order])


def test_chain_beats_raw_on_lidar():
    pos = lidar_like_cloud(10000, seed=2)
    enc = entropy.RangeEncoder()
    gp.encode(pos, enc, gp.PredGeomContexts(),
              sort_mode=gp.SortMode.AZIMUTH)
    nbytes = len(enc.get_bytes())
    raw_bits = 3 * 14  # ~14 bits/axis raw
    # injected noise floor is ~23 bpp; chain coding should land close
    assert nbytes * 8 < 10000 * raw_bits * 0.66  # >34% saving


def test_duplicate_points_survive():
    pos = lidar_like_cloud(100, seed=3)
    pos = np.concatenate([pos, pos[:10]])
    enc = entropy.RangeEncoder()
    ectx = gp.PredGeomContexts()
    order = gp.encode(pos, enc, ectx)
    dec = entropy.RangeDecoder(enc.get_bytes())
    out = gp.decode(len(pos), dec, gp.PredGeomContexts())
    np.testing.assert_array_equal(out, pos[order])


def test_full_pipeline_predictive():
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams,
                                                    FrameEncoder)
    pos = lidar_like_cloud(3000, seed=4)
    rng = np.random.default_rng(5)
    refl = rng.integers(0, 256, len(pos)).astype(np.uint16)
    cloud = PointCloud(pos, reflectances=refl)
    params = EncoderParams(
        geometry_codec=hls.GeometryCodecType.PREDICTIVE,
        merge_duplicated_points=False,
        attributes=[AttributeConfig("reflectance", 8,
                                    hls.AttributeEncoding.PRED, qp=4)])
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    enc.compress(cloud, lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for buf in iter_tlv(bs):
        dec.decompress(buf)
    dec.flush()
    out = outs[0]
    assert out.count == cloud.count
    # geometry lossless (order-independent compare)
    np.testing.assert_array_equal(
        np.sort(morton.encode(out.positions)),
        np.sort(morton.encode(pos)))
    # reflectance lossless: compare via (position, value) multisets
    def key(c, r):
        k = morton.encode(c.astype(np.int64)) << 16
        return np.sort(k + r.astype(np.int64))
    np.testing.assert_array_equal(
        key(out.positions, out.reflectances), key(pos, refl))


def test_angular_roundtrip_lossless():
    pos = lidar_like_cloud(5000, seed=6)
    enc = entropy.RangeEncoder()
    ectx = gp.PredGeomContexts()
    order = gp.encode(pos, enc, ectx, angular=True)
    data = enc.get_bytes()
    dec = entropy.RangeDecoder(data)
    out = gp.decode(len(pos), dec, gp.PredGeomContexts(), angular=True)
    np.testing.assert_array_equal(out, pos[order])


def test_angular_beats_cartesian_on_lidar():
    pos = lidar_like_cloud(10000, seed=7)
    sizes = {}
    for angular in (False, True):
        enc = entropy.RangeEncoder()
        gp.encode(pos, enc, gp.PredGeomContexts(),
                  sort_mode=gp.SortMode.AZIMUTH, angular=angular)
        sizes[angular] = len(enc.get_bytes())
    # the spherical domain pays a secondary-residual tax on synthetic
    # noise; it must stay in the same ballpark as the (now centred)
    # cartesian chain — real laser-structured content is where it wins
    assert sizes[True] < sizes[False] * 1.25


def test_full_pipeline_angular():
    import io as _io
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    pos = lidar_like_cloud(2000, seed=8)
    params = EncoderParams(
        geometry_codec=hls.GeometryCodecType.PREDICTIVE,
        angular_enabled=True, merge_duplicated_points=False)
    bs = _io.BytesIO()
    FrameEncoder(params).compress(PointCloud(pos),
                                  lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    np.testing.assert_array_equal(
        np.sort(morton.encode(outs[0].positions)),
        np.sort(morton.encode(pos)))


def _jitter(n, seed=99):
    rng = np.random.default_rng(seed)
    return rng.integers(-1, 2, (n, 3))


def test_predictive_inter_codec_level():
    pos = lidar_like_cloud(5000, seed=13)
    # jittered reference: round-trips, flags cost ~1 bit/pt at worst
    ref = pos + _jitter(5000)
    enc = entropy.RangeEncoder()
    ectx = gp.PredGeomContexts()
    order = gp.encode(pos, enc, ectx, sort_mode=gp.SortMode.AZIMUTH,
                      ref_positions=ref)
    dec = entropy.RangeDecoder(enc.get_bytes())
    out = gp.decode(len(pos), dec, gp.PredGeomContexts(),
                    ref_positions=ref)
    np.testing.assert_array_equal(out, pos[order])

    # static rigid content (smooth surface, exact compensated ref):
    # snapping to the reference recovers exact points -> clear win.
    # (Noisy-radius sweeps need the structural per-laser ref
    # correspondence of the reference codec — round 2.)
    rng = np.random.default_rng(15)
    az = np.sort(rng.uniform(0, 2 * np.pi, 4000))
    r = 2000 + 300 * np.sin(az * 4)
    smooth = np.round(np.column_stack(
        [r * np.cos(az), r * np.sin(az), 50 * np.sin(az * 2)])
    ).astype(np.int64) + 4096
    enc_i = entropy.RangeEncoder()
    gp.encode(smooth, enc_i, gp.PredGeomContexts(),
              sort_mode=gp.SortMode.AZIMUTH,
              ref_positions=smooth.copy())
    enc_n = entropy.RangeEncoder()
    gp.encode(smooth, enc_n, gp.PredGeomContexts(),
              sort_mode=gp.SortMode.AZIMUTH)
    assert len(enc_i.get_bytes()) < len(enc_n.get_bytes())


def test_predictive_inter_end_to_end():
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    base = lidar_like_cloud(3000, seed=14)
    seq = [PointCloud(base + np.array([3, 1, 0]) * f) for f in range(3)]
    params = EncoderParams(
        geometry_codec=hls.GeometryCodecType.PREDICTIVE,
        merge_duplicated_points=False, inter_prediction=True,
        global_motion=True, random_access_period=16)
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    for c in seq:
        enc.compress(c, lambda b: write_tlv(b, bs))
    enc.flush(lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    assert len(outs) == 3
    for src, out in zip(seq, outs):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)),
            np.sort(morton.encode(src.positions)))


def lidar_grid_cloud(num_lasers=16, npt=1024, every=8, seed=0):
    """On-grid rotating-LiDAR sweep + its calibration tables."""
    from mpeg_pcc_tmc13_tpu.ops import coords
    rng = np.random.default_rng(seed)
    theta = np.round(np.tan(np.linspace(-0.4, 0.1, num_lasers))
                     * (1 << 18)).astype(np.int64)
    zoff = np.full(num_lasers, 400, dtype=np.int64)
    nptv = np.full(num_lasers, npt, dtype=np.int64)
    steps = np.arange(0, npt, every)
    phi = steps * 2 * np.pi / npt
    prof = (2000 + 1500 * np.sin(3 * phi)).astype(np.int64)
    parts = []
    for li in range(num_lasers):
        r = prof + rng.integers(-5, 6, len(steps))
        x = np.round(r * np.cos(phi)).astype(np.int64) + 5000
        y = np.round(r * np.sin(phi)).astype(np.int64) + 5000
        rr = np.round(np.sqrt((x - 5000).astype(float) ** 2
                              + (y - 5000).astype(float) ** 2)
                      ).astype(np.int64)
        z = np.maximum(coords.laser_z_pred(
            rr, np.full(len(steps), li), theta, zoff), 0)
        parts.append(np.column_stack([x, y, z]))
    return np.concatenate(parts), (theta, zoff, nptv)


def test_laser_tables_lossless_and_smaller():
    """Calibrated laser tables (reference numLasers/lasersTheta/
    lasersZ/lasersNumPhiPerTurn): (r, phi-step, laser) coding beats
    the virtual-uniform spherical form on on-grid sweeps."""
    pos, lasers = lidar_grid_cloud()
    n = len(pos)
    sizes = {}
    for las in (None, lasers):
        enc = entropy.RangeEncoder()
        order = gp.encode(pos, enc, gp.PredGeomContexts(),
                          angular=True, lasers=las)
        data = enc.get_bytes()
        out = gp.decode(n, entropy.RangeDecoder(data),
                        gp.PredGeomContexts(), angular=True, lasers=las)
        np.testing.assert_array_equal(out, pos[order])
        sizes[las is not None] = len(data)
    assert sizes[True] < sizes[False] * 0.75


def test_laser_tables_cli(tmp_path):
    from mpeg_pcc_tmc13_tpu.runtime import cli
    from mpeg_pcc_tmc13_tpu.utils import ply
    pos, (theta, zoff, nptv) = lidar_grid_cloud(num_lasers=8)
    in_ply = tmp_path / "in.ply"
    ply.write(ply.PlyCloud(positions=pos.astype(np.float64)),
              str(in_ply), position_is_float=False)
    out_bin = tmp_path / "o.bin"
    rec_ply = tmp_path / "r.ply"
    thetas = ",".join(f"{t / (1 << 18):.6f}" for t in theta)
    assert cli.main([
        "--mode=0", f"--uncompressedDataPath={in_ply}",
        f"--compressedStreamPath={out_bin}", "--geomTreeType=1",
        "--angularEnabled=1", f"--numLasers={len(theta)}",
        f"--lasersTheta={thetas}",
        f"--lasersZ={','.join(str(v) for v in zoff)}",
        f"--lasersNumPhiPerTurn={','.join(str(v) for v in nptv)}",
        "--disableAttributeCoding=1"]) == 0
    assert cli.main(["--mode=1", f"--compressedStreamPath={out_bin}",
                     f"--reconstructedDataPath={rec_ply}"]) == 0
    rec = ply.read(str(rec_ply))
    np.testing.assert_array_equal(
        np.sort(morton.encode(rec.positions.astype(np.int64))),
        np.unique(morton.encode(pos)))


def test_structural_laser_inter():
    """Structural predgeom inter: with laser tables the temporal
    predictor continues the previous point's laser sweep in the
    reference frame — effective even on noisy sweeps where
    NN-of-extrapolation fails (round 1 known limitation)."""
    pos, lasers = lidar_grid_cloud(num_lasers=16, npt=1024, every=8,
                                   seed=1)
    rng = np.random.default_rng(2)
    cur = pos + np.column_stack([rng.integers(3, 6, len(pos)),
                                 rng.integers(-1, 2, len(pos)),
                                 np.zeros(len(pos), dtype=np.int64)])
    sizes = {}
    for ref in (None, pos):
        enc = entropy.RangeEncoder()
        order = gp.encode(cur, enc, gp.PredGeomContexts(), angular=True,
                          lasers=lasers, ref_positions=ref)
        data = enc.get_bytes()
        out = gp.decode(len(cur), entropy.RangeDecoder(data),
                        gp.PredGeomContexts(), angular=True,
                        lasers=lasers, ref_positions=ref)
        np.testing.assert_array_equal(out, cur[order])
        sizes[ref is not None] = len(data)
    assert sizes[True] < sizes[False] * 0.95


def test_structural_laser_inter_codec_level():
    import io

    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    pos, (theta, zoff, nptv) = lidar_grid_cloud(num_lasers=8, seed=3)
    rng = np.random.default_rng(4)
    seq = [pos]
    for _ in range(2):
        seq.append(np.clip(
            seq[-1] + np.column_stack([
                rng.integers(2, 5, len(pos)),
                rng.integers(-1, 2, len(pos)),
                np.zeros(len(pos), dtype=np.int64)]), 0, None))
    expect = [np.unique(morton.encode(c)) for c in seq]
    params = EncoderParams(
        geometry_codec=hls.GeometryCodecType.PREDICTIVE,
        angular_enabled=True, inter_prediction=True,
        random_access_period=8,
        laser_theta=[t / (1 << 18) for t in theta],
        laser_z=list(zoff), laser_npt=list(nptv))
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    for c in seq:
        enc.compress(PointCloud(c), lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    assert len(outs) == len(seq)
    for out, exp in zip(outs, expect):
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions.astype(np.int64))), exp)
