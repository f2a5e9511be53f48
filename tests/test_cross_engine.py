"""Cross-engine conformance: every (encoder engine, decoder engine)
pair must agree on every codec family — the executable-spec guarantee
that the numpy mirrors, native C++, and device paths implement one
bitstream."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
from mpeg_pcc_tmc13_tpu.models import geometry_predictive as gp
from mpeg_pcc_tmc13_tpu.ops import octree as ops
from mpeg_pcc_tmc13_tpu.utils import morton


def cloud(n=3000, depth=9, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)


@pytest.mark.parametrize("mode", [ops.CTX_MODE_NEIGH, ops.CTX_MODE_PARENT])
@pytest.mark.parametrize("bytewise", [True, False])
def test_octree_all_engine_pairs(mode, bytewise):
    pos = cloud(seed=1)
    expect = morton.decode(np.unique(morton.encode(pos)))
    streams = {}
    for eng in ("numpy", "native"):
        enc = entropy.RangeEncoder()
        go.encode(pos, 9, enc, go.OctreeContexts(), engine=eng,
                  ctx_mode=mode, bytewise=bytewise)
        streams[eng] = enc.get_bytes()
    assert streams["numpy"] == streams["native"]
    for eng_enc in ("numpy", "native"):
        for eng_dec in ("numpy", "native"):
            dec = entropy.RangeDecoder(streams[eng_enc])
            out = go.decode(len(pos), 9, dec, go.OctreeContexts(),
                            engine=eng_dec, ctx_mode=mode,
                            bytewise=bytewise)
            np.testing.assert_array_equal(out, expect)


def test_octree_inter_engine_pairs():
    pos = cloud(seed=2)
    rng = np.random.default_rng(3)
    ref = np.unique(morton.encode(
        np.clip(pos + rng.integers(-1, 2, pos.shape), 0, (1 << 9) - 1)))
    expect = morton.decode(np.unique(morton.encode(pos)))
    streams = {}
    for eng in ("numpy", "native"):
        enc = entropy.RangeEncoder()
        go.encode(pos, 9, enc, go.OctreeContexts(), engine=eng,
                  ref_codes=ref)
        streams[eng] = enc.get_bytes()
    assert streams["numpy"] == streams["native"]
    for eng_dec in ("numpy", "native"):
        dec = entropy.RangeDecoder(streams["native"])
        out = go.decode(len(pos), 9, dec, go.OctreeContexts(),
                        engine=eng_dec, ref_codes=ref)
        np.testing.assert_array_equal(out, expect)


def test_predictive_python_fallback_matches_native():
    """The python reconstruction loop is the executable spec of the
    native predchain; they must reconstruct identically (incl. inter
    NN lookups)."""
    from tests.test_predictive import lidar_like_cloud
    pos = lidar_like_cloud(2000, seed=4)
    ref = pos + np.random.default_rng(5).integers(-1, 2, pos.shape)
    enc = entropy.RangeEncoder()
    order = gp.encode(pos, enc, gp.PredGeomContexts(),
                      sort_mode=gp.SortMode.AZIMUTH, ref_positions=ref)
    data = enc.get_bytes()
    out_native = gp.decode(len(pos), entropy.RangeDecoder(data),
                           gp.PredGeomContexts(), ref_positions=ref)
    lib = entropy._LIB
    try:
        entropy._LIB = None   # force python fallback *reconstruction*
        # the entropy decode itself must stay native-compatible: use
        # the python range decoder mirror end-to-end
        dec_py = entropy.RangeDecoder(data, force_python=True)
        out_py = gp.decode(len(pos), dec_py, gp.PredGeomContexts(),
                           ref_positions=ref)
    finally:
        entropy._LIB = lib
    np.testing.assert_array_equal(out_native, out_py)
    np.testing.assert_array_equal(out_native, pos[order])


def test_python_range_coder_decodes_native_octree_stream():
    pos = cloud(n=800, depth=8, seed=6)
    expect = morton.decode(np.unique(morton.encode(pos)))
    enc = entropy.RangeEncoder()   # native
    go.encode(pos, 8, enc, go.OctreeContexts(),
              ctx_mode=ops.CTX_MODE_PARENT, engine="native")
    dec = entropy.RangeDecoder(enc.get_bytes(), force_python=True)
    out = go.decode(len(pos), 8, dec, go.OctreeContexts(),
                    ctx_mode=ops.CTX_MODE_PARENT, engine="numpy")
    np.testing.assert_array_equal(out, expect)

def test_python_mirror_decodes_bytewise_stream():
    """The pure-Python Fenwick mirror is the executable spec of the
    native bytewise occupancy coder."""
    pos = cloud(n=1500, depth=8, seed=9)
    expect = morton.decode(np.unique(morton.encode(pos)))
    enc = entropy.RangeEncoder()   # native
    go.encode(pos, 8, enc, go.OctreeContexts(),
              ctx_mode=ops.CTX_MODE_PARENT, engine="native")
    dec = entropy.RangeDecoder(enc.get_bytes(), force_python=True)
    out = go.decode(len(pos), 8, dec, go.OctreeContexts(),
                    ctx_mode=ops.CTX_MODE_PARENT, engine="numpy")
    np.testing.assert_array_equal(out, expect)
