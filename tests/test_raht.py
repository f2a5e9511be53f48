"""RAHT transform + attribute codec tests."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import hls
from mpeg_pcc_tmc13_tpu.models import attr_raht, attributes
from mpeg_pcc_tmc13_tpu.ops import raht as raht_ops
from mpeg_pcc_tmc13_tpu.utils import morton


def random_codes(n, depth, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    return np.unique(morton.encode(pos)), rng


@pytest.mark.parametrize("n,depth", [(1, 3), (10, 3), (1000, 6), (5000, 8)])
def test_forward_inverse_float(n, depth):
    codes, rng = random_codes(n, depth, seed=n)
    vals = rng.integers(0, 256, (codes.size, 3)).astype(np.float64)
    coeffs = raht_ops.forward(codes, vals, depth)
    assert coeffs.shape == vals.shape
    rec = raht_ops.inverse(codes, coeffs, depth)
    np.testing.assert_allclose(rec, vals, atol=1e-8)


def test_forward_preserves_energy():
    codes, rng = random_codes(2000, 7, seed=2)
    vals = rng.normal(0, 100, (codes.size, 1))
    coeffs = raht_ops.forward(codes, vals, 7)
    # orthonormal transform preserves L2 energy
    np.testing.assert_allclose(
        np.sum(coeffs ** 2), np.sum(vals ** 2), rtol=1e-10)


@pytest.mark.parametrize("n,depth", [(17, 4), (3000, 8)])
def test_forward_inverse_haar(n, depth):
    codes, rng = random_codes(n, depth, seed=n + 1)
    vals = rng.integers(0, 256, (codes.size, 3)).astype(np.int64)
    coeffs = raht_ops.forward(codes, vals, depth, integer_haar=True)
    rec = raht_ops.inverse(codes, coeffs, depth, integer_haar=True)
    np.testing.assert_array_equal(rec, vals)


def _roundtrip_attr(vals, pos, aps, desc):
    ectx = attributes.AttributeContexts()
    body = attr_raht.encode(vals, pos, aps, desc, ectx)
    dctx = attributes.AttributeContexts()
    out = attr_raht.decode(body, pos, aps, desc, dctx)
    return out, len(body)


def test_codec_lossless_haar():
    codes, rng = random_codes(4000, 8, seed=5)
    pos = morton.decode(codes)
    vals = rng.integers(0, 256, (codes.size, 3)).astype(np.int64)
    aps = hls.AttributeParameterSet(init_qp=4, raht_integer_haar=True)
    desc = hls.AttributeDescription("color", 3, 8)
    out, nbytes = _roundtrip_attr(vals, pos, aps, desc)
    np.testing.assert_array_equal(out, vals)
    # random colours are incompressible; bound the ueg expansion
    assert nbytes < codes.size * 3 * 2


def test_codec_lossy_quality():
    # smooth attribute field -> small coded size, bounded error
    codes, _ = random_codes(4000, 8, seed=6)
    pos = morton.decode(codes)
    vals = (pos.sum(axis=1, keepdims=True) // 8).astype(np.int64)
    aps = hls.AttributeParameterSet(init_qp=22)  # step = 8
    desc = hls.AttributeDescription("reflectance", 1, 8)
    out, nbytes = _roundtrip_attr(vals[:, 0], pos, aps, desc)
    err = np.abs(out.astype(np.int64) - vals[:, 0])
    assert err.max() <= 24  # a few quantisation steps
    assert nbytes < codes.size  # < 2 bits/point on smooth data


def test_codec_with_duplicates():
    codes, rng = random_codes(500, 6, seed=7)
    dup = np.sort(np.concatenate([codes, codes[:100]]))
    pos = morton.decode(dup)
    vals = rng.integers(0, 256, (dup.size, 3)).astype(np.int64)
    aps = hls.AttributeParameterSet(init_qp=4, raht_integer_haar=True)
    desc = hls.AttributeDescription("color", 3, 8)
    out, _ = _roundtrip_attr(vals, pos, aps, desc)
    assert out.shape == vals.shape
    # duplicate positions share the mean value
    assert np.array_equal(out[0], out[0])


def test_full_pipeline_raht_colors():
    from tests.test_frame_codec import make_cloud, roundtrip, canon
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams)
    from mpeg_pcc_tmc13_tpu.ops.processing import dedup_with_attributes
    cloud = make_cloud(n=3000, colors=True)
    params = EncoderParams(attributes=[
        AttributeConfig("color", 8, hls.AttributeEncoding.RAHT,
                        qp=4, raht_integer_haar=True)])
    outs, nbytes = roundtrip(cloud, params)
    got = canon(outs[0])
    expect = canon(dedup_with_attributes(cloud))
    np.testing.assert_array_equal(got.positions, expect.positions)
    np.testing.assert_array_equal(got.colors, expect.colors)


def test_full_pipeline_raht_lossy():
    from tests.test_frame_codec import make_cloud, roundtrip, canon
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                    EncoderParams)
    from mpeg_pcc_tmc13_tpu.ops.processing import dedup_with_attributes
    cloud = make_cloud(n=3000, colors=True)
    params = EncoderParams(attributes=[
        AttributeConfig("color", 8, hls.AttributeEncoding.RAHT, qp=28)])
    outs, _ = roundtrip(cloud, params)
    got = canon(outs[0])
    expect = canon(dedup_with_attributes(cloud))
    np.testing.assert_array_equal(got.positions, expect.positions)
    # bounded error on random colors at qp 28 (step=16): loose sanity
    err = np.abs(got.colors.astype(int) - expect.colors.astype(int))
    assert err.mean() < 32


def rough_surface(n=4000, depth=8, seed=0):
    rng = np.random.default_rng(seed)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 1 << depth, (n, 3), dtype=np.int64))))
    vals = (pos.sum(axis=1) // 3 % 256).astype(np.int64)[:, None] \
        + rng.integers(0, 8, (len(pos), 1))
    return pos, vals


@pytest.mark.parametrize("enc_t", [hls.AttributeEncoding.RAHT,
                                   hls.AttributeEncoding.PRED,
                                   hls.AttributeEncoding.LIFT])
def test_layer_qp_offsets(enc_t):
    """ABH per-layer QP deltas (reference qpLayerOffsetsLuma,
    hls.h:921): coarser fine layers trade rate for distortion; the
    decoder must mirror the encoder's per-layer steps exactly."""
    pos, vals = rough_surface(seed=10)
    desc = hls.AttributeDescription(label="reflectance",
                                    num_components=1, bitdepth=8)
    sizes = {}
    for lqp in (None, [0, 6, 12, 18]):
        aps = hls.AttributeParameterSet(aps_id=0, attr_encoding=enc_t,
                                        init_qp=10)
        abh = hls.AttributeBrickHeader(
            layer_qp_deltas_luma=list(lqp or []),
            layer_qp_deltas_chroma=list(lqp or []))
        abh2, _ = hls.AttributeBrickHeader.parse(abh.write())
        body = attributes.encode(vals, pos, aps, desc,
                                 attributes.AttributeContexts(), abh=abh)
        out = attributes.decode(body, pos, aps, desc,
                                attributes.AttributeContexts(), abh=abh2)
        err = np.abs(np.asarray(out).reshape(-1) - vals.reshape(-1))
        sizes[bool(lqp)] = (len(body), err.max())
    assert sizes[True][0] < sizes[False][0]       # cheaper stream
    assert sizes[False][1] <= sizes[True][1]      # uniform QP sharper
    assert sizes[True][1] < 40                    # still bounded


def test_abh_slice_qp_delta_applied():
    """abh_attr_qp_delta shifts every layer's step."""
    pos, vals = rough_surface(seed=11)
    desc = hls.AttributeDescription(label="reflectance",
                                    num_components=1, bitdepth=8)
    aps = hls.AttributeParameterSet(
        aps_id=0, attr_encoding=hls.AttributeEncoding.RAHT, init_qp=4)
    abh = hls.AttributeBrickHeader(qp_delta=24)
    body = attributes.encode(vals, pos, aps, desc,
                             attributes.AttributeContexts(), abh=abh)
    base = attributes.encode(vals, pos, aps, desc,
                             attributes.AttributeContexts())
    assert len(body) < len(base)    # qp 4+24 is much coarser than 4
    out = attributes.decode(body, pos, aps, desc,
                            attributes.AttributeContexts(), abh=abh)
    err = np.abs(np.asarray(out).reshape(-1) - vals.reshape(-1))
    assert 0 < err.max() < 64


@pytest.mark.parametrize("enc_t", [hls.AttributeEncoding.RAHT,
                                   hls.AttributeEncoding.LIFT])
def test_last_component_prediction(enc_t):
    """LCP (reference attrLcpCoeffs, hls.h:887): with correlated
    chroma, predicting comp 2 from comp 1 shrinks the stream at equal
    distortion; the coefficients travel in the ABH."""
    rng = np.random.default_rng(12)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 256, (5000, 3), dtype=np.int64))))
    n = len(pos)
    base = (pos[:, 0] // 2 % 200).astype(np.int64)
    vals = np.stack([rng.integers(0, 256, n),
                     base + rng.integers(-10, 11, n),
                     (base * 7) // 10 + rng.integers(-5, 6, n)], axis=1)
    desc = hls.AttributeDescription(label="color", num_components=3,
                                    bitdepth=8)
    res = {}
    for lcp in (False, True):
        aps = hls.AttributeParameterSet(
            aps_id=0, attr_encoding=enc_t, init_qp=16,
            last_component_prediction_enabled=lcp)
        abh = hls.AttributeBrickHeader()
        body = attributes.encode(vals, pos, aps, desc,
                                 attributes.AttributeContexts(), abh=abh)
        abh2, _ = hls.AttributeBrickHeader.parse(abh.write())
        out = attributes.decode(body, pos, aps, desc,
                                attributes.AttributeContexts(), abh=abh2)
        err = np.abs(np.asarray(out) - vals)
        res[lcp] = (len(body), err.max())
        if lcp:
            assert abh.lcp_coeffs and max(abh.lcp_coeffs) > 0
        else:
            assert not abh.lcp_coeffs
    assert res[True][0] < res[False][0]
    assert res[True][1] <= res[False][1] + 2


def test_lcp_cli_flag(tmp_path):
    from mpeg_pcc_tmc13_tpu.runtime import cli
    from mpeg_pcc_tmc13_tpu.utils import ply
    rng = np.random.default_rng(13)
    pos = morton.decode(np.unique(morton.encode(
        rng.integers(0, 512, (4000, 3), dtype=np.int64)))
    ).astype(np.float64)
    base = (pos[:, 0].astype(np.int64) % 200)
    colors = np.stack([base + 30, base // 2 + 60,
                       (base * 3) // 4 + 20], axis=1).astype(np.uint16)
    in_ply = tmp_path / "in.ply"
    ply.write(ply.PlyCloud(positions=pos, colors=colors), str(in_ply),
              position_is_float=False)
    sizes = {}
    for tag, flag in (("off", "0"), ("on", "1")):
        bs = tmp_path / f"{tag}.bin"
        assert cli.main([
            "--mode=0", f"--uncompressedDataPath={in_ply}",
            f"--compressedStreamPath={bs}", "--qp=22",
            f"--lastComponentPredictionEnabled={flag}",
            "--attribute=color"]) == 0
        rec = tmp_path / f"{tag}.ply"
        assert cli.main(["--mode=1", f"--compressedStreamPath={bs}",
                         f"--reconstructedDataPath={rec}"]) == 0
        assert ply.read(str(rec)).count > 0
        sizes[tag] = bs.stat().st_size
    assert sizes["on"] <= sizes["off"]
