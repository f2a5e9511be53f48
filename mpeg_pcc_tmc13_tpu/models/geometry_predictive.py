"""Predictive geometry codec (LiDAR path): chain prediction.

Counterpart of the reference predictive-tree coder
(`encodePredictiveGeometry` via PredGeomEncoder::encode,
geometry_predictive_encoder.cpp:1151,785; decoder :736; prediction
modes geometry_predictive.h:54-60: None/Delta/Linear2/Linear3).

TPU-first redesign: instead of an explicit tree built with a KD-tree
(reference generateGeomPredictionTree :1186), points are coded as a
single prediction **chain** in a configurable traversal order (the
reference's input sort modes, PredGeomEncOpts::SortMode
geometry_params.h:371-378 — LiDAR sweeps are near-sorted by azimuth
already, which is what makes chain prediction effective).  Because the
chain is lossless, every prediction reads *original* positions, so the
encoder is fully vectorised: all four predictor candidates, per-point
RD mode selection, and residuals are computed in one pass; only the
decoder's recurrence is serial (native predchain_recon).

Syntax per point: 2 mode bits (own adaptive context each, conditioned
on the previous point's mode) + 3 signed residual streams.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np

from ..bitstream import entropy
from ..utils import morton

# per axis: [0..1] zero flag (chained), [2..26) bit-length prefix
# (entropy resbl op — adaptive magnitude class, bypass mantissa)
_AXIS_CTX = 2 + 24
# mode bits: 2 bits x 4 previous-mode contexts
MODE_CTX_SIZE = 4 * 2
# angular mode adds 2 secondary cartesian residual streams (x, y)
PRED_CTX_SIZE = MODE_CTX_SIZE + 5 * _AXIS_CTX


class SortMode(enum.IntEnum):
    """reference PredGeomEncOpts::SortMode (geometry_params.h:371)."""
    NONE = 0
    MORTON = 1
    AZIMUTH = 2
    RADIUS = 3


@dataclass
class PredGeomContexts:
    """reference PredGeomContexts (geometry_predictive.h:84-137)."""
    ctx: np.ndarray = field(
        default_factory=lambda: entropy.new_contexts(PRED_CTX_SIZE))

    def copy(self):
        return PredGeomContexts(self.ctx.copy())


def sort_points(positions: np.ndarray, mode: SortMode) -> np.ndarray:
    """Traversal order (permutation into the chain order)."""
    p = positions.astype(np.int64)
    if mode == SortMode.MORTON:
        return np.argsort(morton.encode(p), kind="stable")
    if mode == SortMode.AZIMUTH:
        key = np.arctan2(p[:, 1].astype(np.float64),
                         p[:, 0].astype(np.float64))
        return np.argsort(key, kind="stable")
    if mode == SortMode.RADIUS:
        key = (p[:, 0] ** 2 + p[:, 1] ** 2).astype(np.float64)
        return np.argsort(key, kind="stable")
    return np.arange(p.shape[0])


def _predictions(p: np.ndarray):
    """All candidate predictions per point: (N,4,3)."""
    n = p.shape[0]
    pred = np.zeros((n, 4, 3), dtype=np.int64)
    if n > 1:
        pred[1:, 1] = p[:-1]                                # delta
    if n > 2:
        pred[2:, 2] = 2 * p[1:-1] - p[:-2]                  # linear2
    if n > 3:
        pred[3:, 3] = p[2:-1] + p[1:-2] - p[:-3]            # linear3
    return pred


def encode(positions: np.ndarray, enc, ctx: PredGeomContexts,
           sort_mode: SortMode = SortMode.MORTON,
           angular: bool = False):
    """Encode positions losslessly; returns chain-order permutation.

    angular=True codes in the spherical domain (r, phi, z) with a
    secondary cartesian residual (reference angular predictive
    geometry, generateGeomPredictionTreeAngular
    geometry_predictive_encoder.cpp:1287; GPS angular_enabled).
    """
    if angular:
        from ..ops import coords
        order = sort_points(positions, SortMode.AZIMUTH if
                            sort_mode == SortMode.MORTON else sort_mode)
        pc = positions.astype(np.int64)[order]
        sph = coords.xyz_to_spherical(pc)
        _chain_encode(sph, enc, ctx)
        # secondary residual: xyz - inverse(sph), z exact by design
        approx = coords.spherical_to_xyz(sph)
        sec = pc - approx                        # (N,3), z column == 0
        for c in range(2):
            off = MODE_CTX_SIZE + (3 + c) * _AXIS_CTX
            cslice = ctx.ctx[off:off + _AXIS_CTX]
            enc.resbl(cslice, sec[:, c].astype(np.int32))
        return order
    order = sort_points(positions, sort_mode)
    p = positions.astype(np.int64)[order]
    _chain_encode(p, enc, ctx)
    return order


def _chain_encode(p: np.ndarray, enc, ctx: PredGeomContexts):
    n = p.shape[0]
    if n == 0:
        return
    pred = _predictions(p)
    # mode eligibility: point i can use mode m only if i >= m
    idx = np.arange(n)[:, None]
    elig = idx >= np.arange(4)[None, :]
    res_all = p[:, None, :] - pred                          # (N,4,3)
    # cost: total magnitude bits (encoder heuristic, reference
    # estimateBits geometry_predictive_encoder.cpp:647)
    cost = np.sum(np.ceil(np.log2(np.abs(res_all) + 1.0)) + 1.0, axis=2)
    cost = np.where(elig, cost, np.inf)
    modes = np.argmin(cost, axis=1).astype(np.uint8)
    res = np.take_along_axis(
        res_all, modes[:, None, None].astype(np.int64), axis=1)[:, 0, :]

    # mode bits: ctx = prev_mode * 2 + bit_index, hi/lo interleaved
    # per point (must match the decoder's per-point order)
    prev_modes = np.concatenate([[0], modes[:-1]]).astype(np.int32)
    ids = np.empty(2 * n, dtype=np.int32)
    bits = np.empty(2 * n, dtype=np.uint8)
    ids[0::2] = prev_modes * 2
    ids[1::2] = prev_modes * 2 + 1
    bits[0::2] = (modes >> 1)
    bits[1::2] = (modes & 1)
    enc.bits(ctx.ctx, ids, bits)
    # residual streams per axis
    for c in range(3):
        off = MODE_CTX_SIZE + c * _AXIS_CTX
        cslice = ctx.ctx[off:off + _AXIS_CTX]
        enc.resbl(cslice, res[:, c].astype(np.int32))


def decode(num_points: int, dec, ctx: PredGeomContexts,
           angular: bool = False) -> np.ndarray:
    n = num_points
    if n == 0:
        return np.zeros((0, 3), dtype=np.int64)
    if angular:
        from ..ops import coords
        sph = _chain_decode(n, dec, ctx)
        sec = np.zeros((n, 3), dtype=np.int64)
        for c in range(2):
            off = MODE_CTX_SIZE + (3 + c) * _AXIS_CTX
            cslice = ctx.ctx[off:off + _AXIS_CTX]
            sec[:, c] = dec.resbl(cslice, n)
        return coords.spherical_to_xyz(sph) + sec
    return _chain_decode(n, dec, ctx)


def _chain_decode(n: int, dec, ctx: PredGeomContexts) -> np.ndarray:
    # mode bits chain on the previous decoded mode (native loop)
    modes = dec.mode_chain(ctx.ctx, n)
    res = np.zeros((n, 3), dtype=np.int64)
    for c in range(3):
        off = MODE_CTX_SIZE + c * _AXIS_CTX
        cslice = ctx.ctx[off:off + _AXIS_CTX]
        res[:, c] = dec.resbl(cslice, n)

    out = np.zeros((n, 3), dtype=np.int64)
    if entropy.native_available():
        import ctypes
        lib = entropy._LIB
        if not hasattr(lib, "_predchain_set"):
            lib.predchain_recon.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib._predchain_set = True
        r = np.ascontiguousarray(res, dtype=np.int64)
        m = np.ascontiguousarray(modes, dtype=np.uint8)
        lib.predchain_recon(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
    else:
        for i in range(n):
            m = modes[i]
            if m == 0:
                p = np.zeros(3, dtype=np.int64)
            elif m == 1:
                p = out[i - 1]
            elif m == 2:
                p = 2 * out[i - 1] - out[i - 2]
            else:
                p = out[i - 1] + out[i - 2] - out[i - 3]
            out[i] = p + res[i]
    return out
