"""Level-sweep OBUF engine: byte-identity vs the conformance oracle.

The level-sweep engine (native/obuf_ls.cc) restructures the reference
BFS octree encoder (geometry_octree_encoder.cpp:1853-2660) into
batched per-level analysis + a thin token-coding loop.  Its output
must be byte-identical to refcodec.cc (which is itself byte-identical
to the tmc3 binary on the shared tool set, tests/test_conformance.py),
across every tool combination the analysis pass has to model: planar
(all four flag axes), QTBT, duplicate points, and inter prediction.
"""

import ctypes

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import hls
from mpeg_pcc_tmc13_tpu.conformance.decoder import _load, geom_params_array
from mpeg_pcc_tmc13_tpu.models import geometry_obuf as go


def _configure(lib):
    c = ctypes
    if getattr(lib, "_obufls_configured", False):
        return
    lib.obufls_encode_octree.argtypes = [
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.POINTER(c.c_uint8), c.c_int]
    lib.obufls_encode_octree.restype = c.c_int
    lib.tmc13ref_encode_octree_intra.argtypes = [
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.POINTER(c.c_uint8), c.c_int]
    lib.tmc13ref_encode_octree_intra.restype = c.c_int
    lib.tmc13ref_encode_octree_inter.argtypes = [
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.POINTER(c.c_int32), c.POINTER(c.c_uint8), c.c_int]
    lib.tmc13ref_encode_octree_inter.restype = c.c_int
    lib._obufls_configured = True


def _enc_ref(lib, pos, axes, gp, ref=None):
    c = ctypes
    out = np.empty(pos.shape[0] * 16 + (1 << 16), dtype=np.uint8)
    if ref is not None:
        n = lib.tmc13ref_encode_octree_inter(
            pos.ctypes.data_as(c.POINTER(c.c_int32)), pos.shape[0],
            ref.ctypes.data_as(c.POINTER(c.c_int32)), ref.shape[0],
            axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes),
            gp.ctypes.data_as(c.POINTER(c.c_int32)),
            out.ctypes.data_as(c.POINTER(c.c_uint8)), len(out))
    else:
        n = lib.tmc13ref_encode_octree_intra(
            pos.ctypes.data_as(c.POINTER(c.c_int32)), pos.shape[0],
            axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes),
            gp.ctypes.data_as(c.POINTER(c.c_int32)),
            out.ctypes.data_as(c.POINTER(c.c_uint8)), len(out))
    assert n > 0, n
    return out[:n].tobytes()


def _enc_ls(lib, pos, axes, gp, ref=None):
    c = ctypes
    out = np.empty(pos.shape[0] * 16 + (1 << 16), dtype=np.uint8)
    refarr = ref if ref is not None else np.zeros(3, dtype=np.int32)
    nref = ref.shape[0] if ref is not None else 0
    n = lib.obufls_encode_octree(
        pos.ctypes.data_as(c.POINTER(c.c_int32)), pos.shape[0],
        refarr.ctypes.data_as(c.POINTER(c.c_int32)), nref,
        axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes),
        gp.ctypes.data_as(c.POINTER(c.c_int32)),
        out.ctypes.data_as(c.POINTER(c.c_uint8)), len(out))
    assert n > 0, n
    return out[:n].tobytes()


def _clouds():
    rng = np.random.default_rng(0)
    sparse = np.unique(
        rng.integers(0, 256, (5000, 3)).astype(np.int32), axis=0)
    side = 96
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    zs = (8 + 4 * np.sin(xs / 9.0) + 3 * np.cos(ys / 7.0)).astype(
        np.int32)
    dense = np.unique(
        np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1).astype(
            np.int32), axis=0)
    dup = np.concatenate([sparse, sparse[::3]], axis=0)
    ref = np.clip(
        sparse + rng.integers(-1, 2, sparse.shape).astype(np.int32), 0,
        255)
    ref = np.unique(ref, axis=0)
    nc = np.unique(
        np.stack([rng.integers(0, 256, 4000),
                  rng.integers(0, 64, 4000),
                  rng.integers(0, 16, 4000)], 1).astype(np.int32),
        axis=0)
    return [("sparse", sparse, 8, None, True),
            ("dense-planar", dense, 7, None, True),
            ("dups", dup, 8, None, False),
            ("inter", sparse, 8, ref, True),
            ("qtbt", nc, None, None, True)]


@pytest.mark.parametrize("planar,dyn,multi,kdep", [
    (0, 0, 0, 0), (1, 0, 0, 0), (1, 1, 0, 0), (1, 0, 1, 0),
    (1, 1, 1, 0), (1, 1, 1, 1), (1, 0, 0, 1), (1, 1, 0, 1)])
def test_ls_matches_oracle(planar, dyn, multi, kdep):
    lib = _load()
    _configure(lib)
    for name, cloud, depth, ref, unique in _clouds():
        axes = (go.axes_for((8, 6, 4), 8) if depth is None
                else go.axes_for(None, depth))
        gps = hls.GeometryParameterSet(
            planar_mode_enabled=bool(planar),
            multiple_planar=bool(multi),
            depth_planar_eligibility=bool(kdep),
            planar_dynamic_obuf=bool(dyn))
        gp = go.geom_params_array(go._gps_flags(gps))
        if not unique:
            gp = gp.copy()
            gp[2] = 0
        p32 = np.ascontiguousarray(cloud, dtype=np.int32)
        r32 = (np.ascontiguousarray(ref, dtype=np.int32)
               if ref is not None else None)
        a = _enc_ref(lib, p32, axes, gp, r32)
        b = _enc_ls(lib, p32, axes, gp, r32)
        assert a == b, (name, planar, dyn, multi, kdep,
                        len(a), len(b))


def _dec_ref(lib, data, n_pts, axes, gp, ref=None):
    c = ctypes
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((n_pts, 3), dtype=np.int32)
    if ref is not None:
        n = lib.tmc13ref_decode_octree_inter(
            buf.ctypes.data_as(c.POINTER(c.c_uint8)), buf.shape[0],
            axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes),
            n_pts, ref.ctypes.data_as(c.POINTER(c.c_int32)),
            ref.shape[0], gp.ctypes.data_as(c.POINTER(c.c_int32)),
            out.ctypes.data_as(c.POINTER(c.c_int32)), n_pts)
    else:
        n = lib.tmc13ref_decode_octree_intra(
            buf.ctypes.data_as(c.POINTER(c.c_uint8)), buf.shape[0],
            axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes),
            n_pts, gp.ctypes.data_as(c.POINTER(c.c_int32)),
            out.ctypes.data_as(c.POINTER(c.c_int32)), n_pts)
    assert n == n_pts, n
    return out[:n].copy()


def _dec_ls(lib, data, n_pts, axes, gp, ref=None):
    c = ctypes
    if not getattr(lib, "_obufls_dec_configured", False):
        lib.obufls_decode_octree.argtypes = [
            c.POINTER(c.c_uint8), c.c_int,
            c.POINTER(c.c_int32), c.c_int, c.c_int,
            c.POINTER(c.c_int32), c.c_int,
            c.POINTER(c.c_int32),
            c.POINTER(c.c_int32), c.c_int]
        lib.obufls_decode_octree.restype = c.c_int
        lib._obufls_dec_configured = True
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((n_pts, 3), dtype=np.int32)
    refarr = ref if ref is not None else np.zeros(3, dtype=np.int32)
    nref = ref.shape[0] if ref is not None else 0
    n = lib.obufls_decode_octree(
        buf.ctypes.data_as(c.POINTER(c.c_uint8)), buf.shape[0],
        axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes), n_pts,
        refarr.ctypes.data_as(c.POINTER(c.c_int32)), nref,
        gp.ctypes.data_as(c.POINTER(c.c_int32)),
        out.ctypes.data_as(c.POINTER(c.c_int32)), n_pts)
    assert n == n_pts, n
    return out[:n].copy()


@pytest.mark.parametrize("planar,dyn,multi,kdep", [
    (0, 0, 0, 0), (1, 0, 0, 0), (1, 1, 0, 0), (1, 0, 1, 0),
    (1, 1, 1, 0), (1, 1, 1, 1), (1, 0, 0, 1), (1, 1, 0, 1)])
def test_ls_decode_matches_oracle(planar, dyn, multi, kdep):
    """The level-sweep DECODER (batched parent-level analysis + thin
    serial loop) must reproduce the BFS oracle's output exactly on the
    same streams, across the same tool matrix as the encode test."""
    lib = _load()
    _configure(lib)
    for name, cloud, depth, ref, unique in _clouds():
        axes = (go.axes_for((8, 6, 4), 8) if depth is None
                else go.axes_for(None, depth))
        gps = hls.GeometryParameterSet(
            planar_mode_enabled=bool(planar),
            multiple_planar=bool(multi),
            depth_planar_eligibility=bool(kdep),
            planar_dynamic_obuf=bool(dyn))
        gp = go.geom_params_array(go._gps_flags(gps))
        if not unique:
            gp = gp.copy()
            gp[2] = 0
        p32 = np.ascontiguousarray(cloud, dtype=np.int32)
        r32 = (np.ascontiguousarray(ref, dtype=np.int32)
               if ref is not None else None)
        data = _enc_ls(lib, p32, axes, gp, r32)
        want = _dec_ref(lib, data, p32.shape[0], axes, gp, r32)
        got = _dec_ls(lib, data, p32.shape[0], axes, gp, r32)
        assert np.array_equal(got, want), (name, planar, dyn, multi,
                                           kdep)
