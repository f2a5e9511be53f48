"""Regression guards for reference-matching semantics that carry RD
parity (the knife-edge behaviours found in round 2)."""

import numpy as np

from mpeg_pcc_tmc13_tpu.ops import processing, lod as lod_ops
from mpeg_pcc_tmc13_tpu.runtime.cli import Config


def test_cli_default_colour_matrix_is_bt709():
    """tmc3's colourMatrix default is BT.709 (TMC3.cpp:1270); YCgCo-R's
    2x chroma amplitude moves the lossy-attr deadzone cliff ~6 QP."""
    cfg = Config()
    cfg.apply("mode", "0")
    cfg.apply("qp", "34")
    cfg.apply("attribute", "color")
    assert cfg.params.attributes[0].cicp_matrix == 1


def test_cli_lod_count_is_refinement_layers():
    """levelOfDetailCount counts refinement layers (TMC3.cpp:1374)."""
    cfg = Config()
    cfg.apply("mode", "0")
    cfg.apply("levelOfDetailCount", "11")
    cfg.apply("attribute", "color")
    assert cfg.params.attributes[0].lod_levels == 12


def test_bt709_rounds_like_reference():
    """Fixed-point BT.709 must round like the reference's std::round
    (colourspace.h:53-58), not truncate."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (4096, 3)).astype(np.int64)
    out = processing.rgb_to_ycbcr_bt709(rgb)
    r, g, b = (rgb[:, i].astype(np.float64) for i in range(3))
    y_ref = np.clip(np.round(0.2126 * r + 0.7152 * g + 0.0722 * b),
                    0, 255)
    cb_ref = np.clip(np.round(-0.114572 * r - 0.385428 * g + 0.5 * b
                              + 128.0), 0, 255)
    # Q16 coefficients differ from the doubles by <1e-5; allow 1 code
    assert np.abs(out[:, 0] - y_ref).max() <= 1
    assert np.abs(out[:, 1] - cb_ref).max() <= 1
    # the mean error must be unbiased (truncation gave a -0.5 bias)
    assert abs(float((out[:, 0] - y_ref).mean())) < 0.05


def test_bt709_inverse_close_roundtrip():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (4096, 3)).astype(np.int64)
    back = processing.ycbcr_bt709_to_rgb(processing.rgb_to_ycbcr_bt709(rgb))
    assert np.abs(back - rgb).max() <= 2     # BT.709 8-bit is lossy


def test_estimate_dist2_power_law():
    """estimateDist2 snaps to the 3*4^s law (AttributeEncoder.cpp:1715)."""
    rng = np.random.default_rng(5)
    # grid spacing 4 -> min NN d2 = 16 -> 3<<2s >= 16 -> s=2 -> 48
    pos = np.unique(rng.integers(0, 64, (3000, 3)), axis=0) * 4
    from mpeg_pcc_tmc13_tpu.utils import morton
    pos = pos[np.argsort(morton.encode(pos.astype(np.int64)))]
    d2 = lod_ops.estimate_dist2(pos)
    assert d2 in (3 << (2 * s) for s in range(21))
    assert d2 >= 16


def test_decoder_outputs_unrounded_scaled_positions():
    """Lossy-scale decode must emit coding-grid ints times the float
    plyScale without rounding (TMC3.cpp:2505) — rounding cost 1.8 dB
    D1 at scale 3/4."""
    import io
    from mpeg_pcc_tmc13_tpu.runtime.encoder import FrameEncoder, \
        EncoderParams
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    rng = np.random.default_rng(6)
    pos = np.unique(rng.integers(0, 256, (2000, 3)).astype(np.int64),
                    axis=0)
    p = EncoderParams(geom_scale_num=3, geom_scale_den=4)
    enc = FrameEncoder(p)
    payloads = []
    enc.compress(PointCloud(pos), payloads.append)
    enc.flush(payloads.append)
    outs = []
    dec = FrameDecoder(outs.append)
    for b in payloads:
        dec.decompress(b)
    dec.flush()
    out = outs[0].positions
    assert out.dtype == np.float64
    frac = np.abs(out - np.round(out))
    assert frac.max() > 0.2       # genuinely fractional coordinates
    # every coordinate is an exact multiple of 4/3
    grid = out * (3.0 / 4.0)
    assert np.abs(grid - np.round(grid)).max() < 1e-9
