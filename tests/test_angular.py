"""Angular (LiDAR) octree tool set: laser-conditioned planar contexts
and decoder-side z compensation (ops/angular.py; reference
determineContextAngleForPlanar geometry_octree.cpp:640 and
compensateZCoordinate :781)."""

import io

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
from mpeg_pcc_tmc13_tpu.ops import angular
from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
from mpeg_pcc_tmc13_tpu.runtime.encoder import EncoderParams, FrameEncoder


def make_scan(n_lasers=16, steps=600, seed=0, bits=14):
    """Small spinning-scanner frame on an integer grid."""
    rng = np.random.default_rng(seed)
    el = np.linspace(-0.4, 0.05, n_lasers)
    az = np.repeat(np.arange(steps) * (2 * np.pi / steps), n_lasers)
    elv = np.tile(el, steps)
    r = 600 + 2800 * rng.random(az.shape[0]) ** 2
    x = r * np.cos(elv) * np.cos(az)
    y = r * np.cos(elv) * np.sin(az)
    z = r * np.sin(elv)
    org = 1 << (bits - 1)
    pos = np.round(np.stack([x, y, z], axis=1)).astype(np.int64) + org
    pos = np.clip(pos, 0, (1 << bits) - 1)
    pos = np.unique(pos, axis=0)
    theta = np.tan(el)
    return pos, theta, (org, org, org)


def _roundtrip(pos, params):
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    enc.compress(PointCloud(pos.copy()), lambda b: write_tlv(b, bs))
    outs = []
    dec = FrameDecoder(outs.append)
    bs.seek(0)
    for buf in iter_tlv(bs):
        dec.decompress(buf)
    dec.flush()
    return outs[0], bs.getbuffer().nbytes


def test_iatan2_q20_matches_arctan2():
    rng = np.random.default_rng(1)
    y = rng.integers(-100000, 100000, 500)
    x = rng.integers(-100000, 100000, 500)
    got = angular.iatan2_q20(y, x)
    want = np.arctan2(y, x) * (1 << 20)
    assert np.abs(got - want).max() < 64   # < 2^-14 rad


def test_angular_lossless_roundtrip_and_gain():
    pos, theta, org = make_scan()
    base = EncoderParams(planar_enabled=True)
    ang = EncoderParams(
        planar_enabled=True, angular_enabled=True, angular_origin=org,
        laser_theta=theta.tolist(), laser_z=[0] * theta.size,
        laser_npt=[600] * theta.size)
    out_b, size_b = _roundtrip(pos, base)
    out_a, size_a = _roundtrip(pos, ang)
    assert np.array_equal(np.unique(out_a.positions, axis=0), pos)
    assert size_a < size_b   # laser contexts must pay on scan content


def test_z_compensation_recovers_precision():
    pos, theta, org = make_scan(seed=3)
    params = dict(
        planar_enabled=True, angular_enabled=True,
        laser_theta=theta.tolist(), laser_z=[0] * theta.size,
        laser_npt=[600] * theta.size)
    # lossy geometry: scale 1/4
    ang = EncoderParams(geom_scale_num=1, geom_scale_den=4,
                        angular_origin=org, **params)
    out, _ = _roundtrip(pos, ang)
    base = EncoderParams(geom_scale_num=1, geom_scale_den=4,
                         planar_enabled=True)
    out_b, _ = _roundtrip(pos, base)

    def d1(rec):
        from mpeg_pcc_tmc13_tpu.ops.recolour import knn
        _, d2 = knn(rec.positions.astype(np.int64), pos, k=1)
        return float(d2.mean())

    # snapping z onto the cones must reduce geometric error
    assert d1(out) < d1(out_b)


def test_compensate_z_identity_when_ambiguous():
    """Close-set lasers (separation < tol) must never snap."""
    info = angular.laser_info([0, 10], [0, 0], [100, 100])
    pos = np.array([[1000, 1000, 500]], dtype=np.int64)
    out = angular.compensate_z(pos, info, (0, 0, 0), tol=1000)
    assert np.array_equal(out, pos)
