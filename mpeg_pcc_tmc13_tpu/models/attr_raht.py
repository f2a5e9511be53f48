"""RAHT attribute codec: transform + quantise + residual entropy coding.

Counterpart of the reference `regionAdaptiveHierarchicalTransform[Inverse]`
(RAHT.cpp:1998,2038) + the coefficient coder in AttributeEncoder.cpp.
Transform structure is geometry-derived on both sides (ops/raht.py), so
the payload is just the quantised coefficients: per component, a
zero-run + sign + ueg residual stream (bitstream/entropy.py residuals).

QP -> stepsize follows the reference's 6-QP-per-octave law
(quantization.cpp:46-53): step = 2**((qp-4)/6), fixed-point Q16.
qp==4 is step 1; with the integer-Haar transform that is exactly
lossless.
"""

from __future__ import annotations

import numpy as np

from ..bitstream import entropy
from ..bitstream.hls import AttributeDescription, AttributeParameterSet
from ..ops import raht as raht_ops
from ..utils import morton
from .attributes import AttributeContexts, RES_CTX_SIZE, _RES_PREFIX_MAX, \
    _RES_K


def qp_to_step_q16(qp: int) -> int:
    return max(1, int(round((2.0 ** ((qp - 4) / 6.0)) * 65536)))


def _quantize(c: np.ndarray, step_q16: int) -> np.ndarray:
    if c.dtype == np.int64 and step_q16 == 65536:
        return c.astype(np.int64)
    q = np.round(c.astype(np.float64) * 65536.0 / step_q16)
    return q.astype(np.int64)


def _dequantize(q: np.ndarray, step_q16: int, integer: bool) -> np.ndarray:
    if integer and step_q16 == 65536:
        return q.astype(np.int64)
    d = q.astype(np.float64) * step_q16 / 65536.0
    return np.round(d).astype(np.int64) if integer else d


def _tree_depth(codes: np.ndarray) -> int:
    hi = int(codes.max()) if codes.size else 0
    return max((hi.bit_length() + 2) // 3, 1)


def _unique_and_inverse(codes: np.ndarray):
    """codes sorted (may contain dups) -> (unique, inverse_map)."""
    keep = np.concatenate([[True], codes[1:] != codes[:-1]]) \
        if codes.size else np.zeros(0, bool)
    inv = np.cumsum(keep) - 1
    return codes[keep], inv, keep


def _steps(aps, ncomp, abh=None):
    return [qp_to_step_q16(max(aps.init_qp
                               + (aps.chroma_qp_offset if c > 0 else 0)
                               + (abh.layer_qp_offset(c, 0)
                                  if abh is not None else 0),
                               4)) for c in range(ncomp)]


def step_q16_vec(qp: np.ndarray) -> np.ndarray:
    """Vectorised QP -> Q16 stepsize (per-point region QPs)."""
    q = np.maximum(np.asarray(qp, dtype=np.float64), 4.0)
    return np.maximum(
        1, np.round((2.0 ** ((q - 4.0) / 6.0)) * 65536.0)).astype(np.int64)


def _step_fn(aps, abh):
    """(component, layer) -> step_q16 with ABH slice/layer QP deltas
    (reference deriveQps, AttributeCommon.cpp).  fn.qp exposes the QP
    itself for per-point region offsets."""
    base = [aps.init_qp + (aps.chroma_qp_offset if c > 0 else 0)
            for c in range(3)]

    def qp(c, layer):
        q = base[min(c, 2)]
        if abh is not None:
            q += abh.layer_qp_offset(c, layer)
        return q

    def fn(c, layer):
        return qp_to_step_q16(max(qp(c, layer), 4))
    fn.qp = qp
    return fn


def _lcp_estimate(c1: np.ndarray, c2: np.ndarray) -> int:
    """Per-layer last-component prediction coefficient (reference
    computeLastComponentPredictionCoeff, AttributeEncoder.cpp:1499):
    least-squares c2 ~ (k/4) * c1, k clipped to [-8, 8]."""
    s11 = float(np.dot(c1.astype(np.float64), c1.astype(np.float64)))
    if s11 <= 0.0:
        return 0
    s12 = float(np.dot(c1.astype(np.float64), c2.astype(np.float64)))
    return int(np.clip(round(4.0 * s12 / s11), -8, 8))


def _lcp_pred(k: int, dq1: np.ndarray, integer: bool) -> np.ndarray:
    if integer:
        return (np.int64(k) * dq1.astype(np.int64)) >> 2
    return k * dq1 / 4.0


def _ref_pyramid(ref, aps, depth, haar):
    if ref is None or not aps.inter_prediction_enabled \
            or not aps.raht_prediction_enabled or not len(ref[0]):
        return None
    from ..ops.raht import ref_mean_pyramid
    return ref_mean_pyramid(
        morton.encode(np.asarray(ref[0], dtype=np.int64)),
        ref[1], depth, haar)


def encode(values: np.ndarray, positions: np.ndarray,
           aps: AttributeParameterSet, desc: AttributeDescription,
           ctx: AttributeContexts, ref=None, abh=None) -> bytes:
    codes = morton.encode(positions.astype(np.int64))
    uniq, inv, keep = _unique_and_inverse(codes)
    vals = np.asarray(values)
    if vals.ndim == 1:
        vals = vals[:, None]
    if uniq.size != codes.size:
        # duplicates: mean-reduce (reference reduceUnique, RAHT.cpp:300)
        sums = np.zeros((uniq.size, vals.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, vals.astype(np.int64))
        counts = np.bincount(inv)[:, None]
        uvals = (sums + counts // 2) // counts
    else:
        uvals = vals.astype(np.int64)
    depth = _tree_depth(uniq)
    haar = aps.raht_integer_haar
    ncomp = uvals.shape[1]
    steps = _steps(aps, ncomp, abh)
    step_at = _step_fn(aps, abh)
    enc = entropy.RangeEncoder()

    lcp_on = (aps.last_component_prediction_enabled and ncomp == 3
              and abh is not None)

    if aps.raht_prediction_enabled and uniq.size > 1:
        def quant(arr, tag):
            cols = [_quantize(arr[:, c], step_at(c, tag))
                    for c in range(ncomp)]
            if lcp_on:
                # chunk-order coefficient: subtract the predicted
                # part of comp 2 before quantising
                dq1 = _dequantize(cols[1], step_at(1, tag), haar)
                k = _lcp_estimate(arr[:, 1], arr[:, 2])
                abh.lcp_coeffs.append(k)
                cols[2] = _quantize(
                    arr[:, 2] - _lcp_pred(k, dq1, haar),
                    step_at(2, tag))
            q = np.stack(cols, axis=1)
            for c in range(ncomp):
                cs = ctx.residuals[c * RES_CTX_SIZE:
                                   (c + 1) * RES_CTX_SIZE]
                enc.residuals(cs, q[:, c].astype(np.int32),
                              _RES_PREFIX_MAX, _RES_K)
            return q

        def dequant(q, tag):
            cols = [_dequantize(q[:, c], step_at(c, tag), haar)
                    for c in range(ncomp)]
            if lcp_on:
                cols[2] = cols[2] + _lcp_pred(abh.lcp_coeffs[-1],
                                              cols[1], haar)
            return np.stack(cols, axis=1)

        raht_ops.forward_predicted(uniq, uvals, depth, quant, dequant,
                                   integer_haar=haar,
                                   ref_pyramid=_ref_pyramid(
                                       ref, aps, depth, haar))
        return enc.get_bytes()

    coeffs = raht_ops.forward(uniq, uvals, depth, integer_haar=haar)
    for c in range(ncomp):
        q = _quantize(coeffs[:, c], steps[c])
        cslice = ctx.residuals[c * RES_CTX_SIZE:(c + 1) * RES_CTX_SIZE]
        enc.residuals(cslice, q.astype(np.int32), _RES_PREFIX_MAX, _RES_K)
    return enc.get_bytes()


def decode(data: bytes, positions: np.ndarray,
           aps: AttributeParameterSet, desc: AttributeDescription,
           ctx: AttributeContexts, ref=None, abh=None) -> np.ndarray:
    codes = morton.encode(positions.astype(np.int64))
    uniq, inv, keep = _unique_and_inverse(codes)
    depth = _tree_depth(uniq)
    haar = aps.raht_integer_haar
    n = uniq.size
    ncomp = desc.num_components
    steps = _steps(aps, ncomp, abh)
    step_at = _step_fn(aps, abh)
    dec = entropy.RangeDecoder(data)

    lcp_on = (aps.last_component_prediction_enabled and ncomp == 3
              and abh is not None and len(abh.lcp_coeffs) > 0)
    lcp_idx = [0]

    if aps.raht_prediction_enabled and n > 1:
        def read_q(count, tag):
            cols = []
            for c in range(ncomp):
                cs = ctx.residuals[c * RES_CTX_SIZE:
                                   (c + 1) * RES_CTX_SIZE]
                cols.append(dec.residuals(cs, count,
                                          _RES_PREFIX_MAX, _RES_K))
            return np.stack(cols, axis=1).astype(np.int64)

        def dequant(q, tag):
            cols = [_dequantize(q[:, c], step_at(c, tag), haar)
                    for c in range(ncomp)]
            if lcp_on:
                i = min(lcp_idx[0], len(abh.lcp_coeffs) - 1)
                lcp_idx[0] += 1
                cols[2] = cols[2] + _lcp_pred(abh.lcp_coeffs[i],
                                              cols[1], haar)
            return np.stack(cols, axis=1)

        vals = raht_ops.inverse_predicted(uniq, depth, read_q, dequant,
                                          ncomp, integer_haar=haar,
                                          ref_pyramid=_ref_pyramid(
                                              ref, aps, depth, haar))
        if not haar:
            vals = np.round(vals).astype(np.int64)
        out = vals[inv]
        return out[:, 0] if ncomp == 1 else out

    cols = []
    for c in range(ncomp):
        cslice = ctx.residuals[c * RES_CTX_SIZE:(c + 1) * RES_CTX_SIZE]
        q = dec.residuals(cslice, n, _RES_PREFIX_MAX, _RES_K)
        cols.append(_dequantize(q.astype(np.int64), steps[c], haar))
    coeffs = np.stack(cols, axis=1)
    vals = raht_ops.inverse(uniq, coeffs, depth, integer_haar=haar)
    if not haar:
        vals = np.round(vals).astype(np.int64)
    hi = (1 << desc.bitdepth) - 1
    # YCgCo-R chroma is signed (bitdepth+1); clip only the luma-like
    # range when unsigned storage is implied by the descriptor
    out = vals[inv]
    if ncomp == 1:
        return out[:, 0]
    return out
