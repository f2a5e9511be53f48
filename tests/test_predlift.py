"""LoD + predicting/lifting attribute codec tests."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import hls
from mpeg_pcc_tmc13_tpu.models import attr_predlift, attributes
from mpeg_pcc_tmc13_tpu.ops import lod as lod_ops
from mpeg_pcc_tmc13_tpu.utils import morton


def make_positions(n, depth, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    codes = np.unique(morton.encode(pos))
    return morton.decode(codes), rng


def test_lod_assignment_deterministic():
    lv = lod_ops.assign_lod_levels(64, 4, period=4)
    assert lv[0] == 0          # rank 0 -> coarsest
    assert lv[1] == 3          # finest
    assert lv[4] == 2
    assert lv[16] == 1
    assert (np.sort(np.unique(lv)) == [0, 1, 2, 3]).all()


def test_knn_returns_decodable_predictors():
    pos, _ = make_positions(2000, 8, seed=1)
    lv = lod_ops.assign_lod_levels(len(pos), 5)
    nbr, wq = lod_ops.knn_predictors(pos, lv)
    # every neighbour must be in a strictly coarser level, or an
    # earlier point within level 0
    for i in range(len(pos)):
        for j, nb in enumerate(nbr[i]):
            if nb < 0:
                continue
            if lv[i] == 0:
                assert nb < i and lv[nb] == 0
            else:
                assert lv[nb] < lv[i]
    # weights normalised to Q16 (within rounding)
    valid = nbr >= 0
    sums = np.where(valid, wq, 0).sum(axis=1)
    has = valid.any(axis=1)
    assert np.all(np.abs(sums[has] - 65536) <= 3)


def _roundtrip(vals, pos, aps, desc):
    ectx = attributes.AttributeContexts()
    body = attr_predlift.encode(vals, pos, aps, desc, ectx)
    dctx = attributes.AttributeContexts()
    out = attr_predlift.decode(body, pos, aps, desc, dctx)
    return out, len(body)


def test_pred_lossless_qp4():
    pos, rng = make_positions(3000, 8, seed=2)
    vals = rng.integers(0, 256, (len(pos), 3)).astype(np.int64)
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.PRED, init_qp=4)
    desc = hls.AttributeDescription("color", 3, 8)
    out, nbytes = _roundtrip(vals, pos, aps, desc)
    np.testing.assert_array_equal(out, vals)


def test_pred_reflectance_lossless():
    pos, rng = make_positions(1000, 7, seed=3)
    vals = rng.integers(0, 65536, len(pos)).astype(np.int64)
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.PRED, init_qp=4)
    desc = hls.AttributeDescription("reflectance", 1, 16)
    out, _ = _roundtrip(vals, pos, aps, desc)
    np.testing.assert_array_equal(out, vals)


def test_pred_smooth_field_compresses():
    pos, _ = make_positions(4000, 8, seed=4)
    vals = (pos.sum(axis=1) // 4).astype(np.int64)[:, None]
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.PRED, init_qp=4)
    desc = hls.AttributeDescription("reflectance", 1, 8)
    out, nbytes = _roundtrip(vals[:, 0], pos, aps, desc)
    np.testing.assert_array_equal(out, vals[:, 0])
    # smooth field predicts well: far below 8 bits/point
    assert nbytes * 8 < 6 * len(pos)


def test_pred_lossy_bounded_error():
    pos, rng = make_positions(2000, 8, seed=5)
    vals = (pos.sum(axis=1) // 4).astype(np.int64)
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.PRED, init_qp=22)  # step 8
    desc = hls.AttributeDescription("reflectance", 1, 8)
    out, _ = _roundtrip(vals, pos, aps, desc)
    assert np.abs(out - vals).max() <= 8


def test_lift_roundtrip_qp4_near_lossless():
    pos, rng = make_positions(2000, 8, seed=6)
    vals = rng.integers(0, 256, (len(pos), 3)).astype(np.int64)
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.LIFT, init_qp=4)
    desc = hls.AttributeDescription("color", 3, 8)
    out, _ = _roundtrip(vals, pos, aps, desc)
    # lifting with step-1 quantisation is exactly invertible
    np.testing.assert_array_equal(out, vals)


def test_lift_lossy():
    pos, _ = make_positions(3000, 8, seed=7)
    vals = (pos // 2).astype(np.int64)  # smooth 3-component field
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.LIFT, init_qp=28)
    desc = hls.AttributeDescription("color", 3, 8)
    out, nbytes = _roundtrip(vals, pos, aps, desc)
    err = np.abs(out - vals)
    assert err.mean() < 16


def test_full_pipeline_predlift():
    from tests.test_frame_codec import make_cloud, roundtrip, canon
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams)
    from mpeg_pcc_tmc13_tpu.ops.processing import dedup_with_attributes
    cloud = make_cloud(n=2000, colors=True, refl=True)
    params = EncoderParams(attributes=[
        AttributeConfig("color", 8, hls.AttributeEncoding.PRED, qp=4),
        AttributeConfig("reflectance", 8, hls.AttributeEncoding.LIFT, qp=4),
    ])
    outs, _ = roundtrip(cloud, params)
    got = canon(outs[0])
    expect = canon(dedup_with_attributes(cloud))
    np.testing.assert_array_equal(got.positions, expect.positions)
    np.testing.assert_array_equal(got.colors, expect.colors)
    np.testing.assert_array_equal(got.reflectances, expect.reflectances)


def test_dist2_lod_assignment():
    pos, _ = make_positions(3000, 9, seed=10)
    lv = lod_ops.assign_lod_levels_dist2(pos, 6, dist2_base=64 ** 2)
    assert lv.shape == (len(pos),)
    assert lv.min() == 0
    # the coarsest level is a strict subsample
    counts = np.bincount(lv, minlength=6)
    assert 0 < counts[0] < len(pos)
    # level-0 points pairwise distance >= dist2_base
    sel = pos[lv == 0]
    if len(sel) > 1:
        d = sel[:, None, :] - sel[None, :, :]
        d2 = (d * d).sum(-1) + np.eye(len(sel), dtype=np.int64) * (1 << 40)
        assert d2.min() >= 64 ** 2


def test_dist2_native_matches_python_fallback():
    from mpeg_pcc_tmc13_tpu.bitstream import entropy as _e
    pos, _ = make_positions(300, 7, seed=11)
    native = lod_ops.assign_lod_levels_dist2(pos, 4, 32 ** 2)
    lib = _e._LIB
    _e._LIB = None
    try:
        py = lod_ops.assign_lod_levels_dist2(pos, 4, 32 ** 2)
    finally:
        _e._LIB = lib
    np.testing.assert_array_equal(native, py)


def test_pred_lossless_with_dist2_lod():
    pos, rng = make_positions(2000, 8, seed=12)
    vals = rng.integers(0, 256, (len(pos), 3)).astype(np.int64)
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.PRED, init_qp=4,
        dist2=16 ** 2)
    desc = hls.AttributeDescription("color", 3, 8)
    out, _ = _roundtrip(vals, pos, aps, desc)
    np.testing.assert_array_equal(out, vals)


def test_progressive_attribute_decode():
    """Truncated LoD decode: coarse chunks exact, fine levels predicted."""
    pos, _ = make_positions(3000, 8, seed=20)
    vals = (pos.sum(axis=1) // 3).astype(np.int64)  # smooth field
    aps = hls.AttributeParameterSet(
        attr_encoding=hls.AttributeEncoding.PRED, init_qp=4)
    desc = hls.AttributeDescription("reflectance", 1, 8)
    ectx = attributes.AttributeContexts()
    body = attr_predlift.encode(vals, pos, aps, desc, ectx)
    full = attr_predlift.decode(body, pos, aps, desc,
                                attributes.AttributeContexts())
    np.testing.assert_array_equal(full, vals)
    prev_err = None
    for k in (2, 4, 6):
        out = attr_predlift.decode(body, pos, aps, desc,
                                   attributes.AttributeContexts(),
                                   max_levels=k)
        err = float(np.abs(out - vals).mean())
        if prev_err is not None:
            assert err <= prev_err + 1e-9  # more levels -> better
        prev_err = err
    assert prev_err < 3  # smooth field predicts well even truncated


def test_scalable_lifting_truncated_decode():
    """Scalable lifting (reference aps_scalable_enable_flag): the
    stream is chunked per LoD level; decoding only the first k chunks
    yields a coarse-but-valid reconstruction, and the full decode is
    identical to the non-scalable result."""
    rng = np.random.default_rng(21)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 512, (6000, 3), dtype=np.int64))))
    vals = (pos[:, 0] // 4 + pos[:, 1] // 8).astype(np.int64)[:, None]
    desc = hls.AttributeDescription(label="reflectance",
                                    num_components=1, bitdepth=8)
    aps = hls.AttributeParameterSet(
        aps_id=0, attr_encoding=hls.AttributeEncoding.LIFT, init_qp=10,
        scalable_lifting_enabled=True)
    body = attributes.encode(vals, pos, aps, desc,
                             attributes.AttributeContexts())
    full = np.asarray(attributes.decode(
        body, pos, aps, desc, attributes.AttributeContexts()))
    errs = []
    for ml in (1, 3, 0):
        out = np.asarray(attributes.decode(
            body, pos, aps, desc, attributes.AttributeContexts(),
            max_lod_levels=ml))
        errs.append(np.abs(out.reshape(-1) - vals.reshape(-1)).mean())
    # more levels -> strictly better; ml=0 (all) == full decode
    assert errs[1] < errs[0]
    assert errs[2] == np.abs(full.reshape(-1) - vals.reshape(-1)).mean()
    assert errs[2] <= 1.0
    # rate overhead of chunking is small
    aps_ns = hls.AttributeParameterSet(
        aps_id=0, attr_encoding=hls.AttributeEncoding.LIFT, init_qp=10)
    body_ns = attributes.encode(vals, pos, aps_ns, desc,
                                attributes.AttributeContexts())
    assert len(body) < len(body_ns) * 1.1


def test_region_qp_boxes():
    """Region QPs (reference QpRegion, hls.h:953): a box with negative
    QP offset reconstructs sharper inside than outside, end-to-end
    through the frame codec."""
    import io

    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams,
                                                    FrameEncoder)
    rng = np.random.default_rng(30)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 256, (8000, 3), dtype=np.int64))))
    refl = (pos[:, 0] * 2 + pos[:, 1]).astype(np.uint16) % 250
    cloud = PointCloud(pos, reflectances=refl)
    box = ((0, 0, 0), (128, 256, 256), (-18, -18))
    params = EncoderParams(attributes=[AttributeConfig(
        "reflectance", 16, hls.AttributeEncoding.PRED, qp=28,
        qp_regions=[box])])
    bs = io.BytesIO()
    FrameEncoder(params).compress(cloud, lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in iter_tlv(bs):
        dec.decompress(b)
    dec.flush()
    out = outs[0]
    # match up by position
    a = np.lexsort(pos.T)
    b = np.lexsort(out.positions.T)
    np.testing.assert_array_equal(pos[a], out.positions[b])
    err = np.abs(out.reflectances[b].astype(np.int64)
                 - refl[a].astype(np.int64))
    inside = pos[a][:, 0] < 128
    assert err[inside].mean() < err[~inside].mean() * 0.5


def test_inter_component_prediction():
    """ICP (reference inter_component_prediction_enabled_flag): chroma
    residuals predicted from the luma residual with per-level Q2
    coefficients; cheaper on RGB-correlated content at equal error."""
    rng = np.random.default_rng(33)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 256, (5000, 3), dtype=np.int64))))
    n = len(pos)
    base = (pos[:, 0] // 2 % 200).astype(np.int64)
    vals = np.stack([base + rng.integers(-8, 9, n),
                     (base * 8) // 10 + rng.integers(-4, 5, n),
                     (base * 6) // 10 + rng.integers(-4, 5, n)], axis=1)
    desc = hls.AttributeDescription(label="color", num_components=3,
                                    bitdepth=8)
    res = {}
    for icp in (False, True):
        aps = hls.AttributeParameterSet(
            aps_id=0, attr_encoding=hls.AttributeEncoding.PRED,
            init_qp=16, inter_component_prediction_enabled=icp)
        abh = hls.AttributeBrickHeader()
        body = attributes.encode(vals, pos, aps, desc,
                                 attributes.AttributeContexts(), abh=abh)
        abh2, _ = hls.AttributeBrickHeader.parse(abh.write())
        out = attributes.decode(body, pos, aps, desc,
                                attributes.AttributeContexts(), abh=abh2)
        err = np.abs(np.asarray(out) - vals)
        res[icp] = (len(body), err.max())
        if icp:
            assert abh.icp_coeffs and max(abh.icp_coeffs) > 0
    assert res[True][0] < res[False][0]
    assert res[True][1] <= res[False][1] + 2
