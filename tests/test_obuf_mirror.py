"""Array-op mirror of the OBUF batched analysis == C++ batched pass.

ops/octree_obuf.py re-expresses the level-sweep engine's per-level
analysis (neighbour gathers + the eight context derivations + skip
inference) as pure array operations — the TPU-lowerable form.  This
test holds its token stream bit-identical to the C++ engine's debug
dump on every level, for cubic and QTBT trees (intra, planar off).
"""

import ctypes

import numpy as np

from mpeg_pcc_tmc13_tpu.bitstream import hls
from mpeg_pcc_tmc13_tpu.conformance.decoder import _load, geom_params_array
from mpeg_pcc_tmc13_tpu.models import geometry_obuf as go
from mpeg_pcc_tmc13_tpu.ops import octree_obuf as mirror


def _cxx_tokens(pos, axes, gp):
    lib = _load()
    c = ctypes
    lib.obufls_encode_octree_dbg.argtypes = [
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.POINTER(c.c_uint8), c.c_int,
        c.POINTER(c.c_uint32), c.c_int, c.POINTER(c.c_int32)]
    lib.obufls_encode_octree_dbg.restype = c.c_int
    cap = pos.shape[0] * 16 + (1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    toks = np.zeros(pos.shape[0] * 24 + (1 << 12), dtype=np.uint32)
    lvl_counts = np.zeros(len(axes), dtype=np.int32)
    ref = np.zeros(3, dtype=np.int32)
    n = lib.obufls_encode_octree_dbg(
        pos.ctypes.data_as(c.POINTER(c.c_int32)), pos.shape[0],
        ref.ctypes.data_as(c.POINTER(c.c_int32)), 0,
        axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes),
        gp.ctypes.data_as(c.POINTER(c.c_int32)),
        out.ctypes.data_as(c.POINTER(c.c_uint8)), cap,
        toks.ctypes.data_as(c.POINTER(c.c_uint32)), len(toks),
        lvl_counts.ctypes.data_as(c.POINTER(c.c_int32)))
    assert n > 0
    per_level = []
    pos_ = 0
    for cnt in lvl_counts:
        per_level.append(toks[pos_:pos_ + int(cnt)].copy())
        pos_ += int(cnt)
    return per_level


def _levels(pos, axes, depth):
    """Bottom-up level construction in numpy: per level sorted node
    coordinates + child-occupancy words."""
    keys = np.sort(mirror.node_keys(pos[:, 0], pos[:, 1], pos[:, 2],
                                    axes, depth))
    lvl = [None] * (depth + 1)
    lvl[depth] = np.unique(keys)
    occs = [None] * depth
    for d in range(depth - 1, -1, -1):
        parents, idx = np.unique(lvl[d + 1] >> 3, return_inverse=True)
        occ = np.zeros(len(parents), dtype=np.int64)
        np.bitwise_or.at(occ, idx, 1 << (lvl[d + 1] & 7))
        lvl[d] = parents
        occs[d] = occ
    return lvl, occs


def _keys_to_pos(keys, axes, depth):
    n = len(keys)
    px = np.zeros(n, dtype=np.int64)
    py = np.zeros(n, dtype=np.int64)
    pz = np.zeros(n, dtype=np.int64)
    for d in range(depth):
        b = (keys >> (3 * (depth - 1 - d))) & 7
        coded = int(axes[d])
        if coded & 4:
            px = (px << 1) | ((b >> 2) & 1)
        if coded & 2:
            py = (py << 1) | ((b >> 1) & 1)
        if coded & 1:
            pz = (pz << 1) | (b & 1)
    return px, py, pz


def _check(pos, axes):
    gps = hls.GeometryParameterSet(planar_mode_enabled=False)
    gp = go.geom_params_array(go._gps_flags(gps))
    pos32 = np.ascontiguousarray(pos, dtype=np.int32)
    cxx = _cxx_tokens(pos32, axes, gp)
    depth = len(axes)
    lvl, occs = _levels(pos.astype(np.int64), axes, depth)
    for d in range(depth):
        px, py, pz = _keys_to_pos(lvl[d], axes, d)
        got = mirror.analyze_level(px, py, pz, occs[d], axes, d,
                                   int(axes[d]))
        want = cxx[d]
        assert got.shape == want.shape, (d, got.shape, want.shape)
        bad = np.nonzero(got != want)[0]
        assert bad.size == 0, (
            d, bad[:5], [hex(x) for x in got[bad[:5]]],
            [hex(x) for x in want[bad[:5]]])


def test_mirror_cubic():
    rng = np.random.default_rng(7)
    pos = np.unique(rng.integers(0, 256, (4000, 3)).astype(np.int64),
                    axis=0)
    _check(pos, go.axes_for(None, 8))


def test_mirror_surface():
    side = 80
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    zs = (20 + 10 * np.sin(xs / 9.0) + 8 * np.cos(ys / 7.0)).astype(
        np.int64)
    pos = np.unique(
        np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1), axis=0)
    _check(pos, go.axes_for(None, 7))


def test_mirror_qtbt():
    rng = np.random.default_rng(11)
    pos = np.unique(
        np.stack([rng.integers(0, 256, 3000),
                  rng.integers(0, 64, 3000),
                  rng.integers(0, 16, 3000)], 1).astype(np.int64),
        axis=0)
    _check(pos, go.axes_for((8, 6, 4), 8))
