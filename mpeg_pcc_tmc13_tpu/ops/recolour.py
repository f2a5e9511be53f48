"""Recolouring: attribute transfer source cloud -> reconstructed geometry.

Counterpart of the reference `recolour()` (pointset_processing.h:194,
algorithm doc pointset_processing.cpp:230-250): for each reconstructed
point, blend (a) the attribute of its nearest source point (forward set
Ψ₁) and (b) the mean attribute of source points whose nearest
reconstructed point it is (backward set Ψ₂).

The reference uses nanoflann KD-trees (pointset_processing.cpp:269-271);
here both directions are Morton-window candidate searches (ops/lod.py
rationale) — vectorised gathers, no tree build.  Encoder-side only
(non-normative), so exact neighbour parity with the reference is not
required for conformance.
"""

from __future__ import annotations

import numpy as np

from ..utils import morton
from ..models.pointcloud import PointCloud


def knn(src_pos: np.ndarray, query_pos: np.ndarray, k: int = 1,
        window: int = 8):
    """k (approximately) nearest src indices + squared distances per
    query point.  Candidates = +-window around the Morton insertion
    position; exact within the window, deterministic ties (lowest
    Morton rank).  Returns (idx (Q,k), d2 (Q,k))."""
    nq = query_pos.shape[0]
    ns = src_pos.shape[0]
    if ns == 0 or nq == 0:
        return (np.zeros((nq, k), dtype=np.int64),
                np.zeros((nq, k), dtype=np.int64))
    s_codes = morton.encode(src_pos.astype(np.int64))
    order = np.argsort(s_codes, kind="stable")
    s_sorted = s_codes[order]
    pos_sorted = src_pos[order].astype(np.int64)

    q_codes = morton.encode(query_pos.astype(np.int64))
    ins = np.searchsorted(s_sorted, q_codes)
    offs = np.arange(-window, window, dtype=np.int64)
    cand = np.clip(ins[:, None] + offs[None, :], 0, ns - 1)
    d = pos_sorted[cand] - query_pos[:, None, :].astype(np.int64)
    d2 = np.sum(d * d, axis=-1)
    top = np.argsort(d2, kind="stable", axis=1)[:, :k]
    idx = order[np.take_along_axis(cand, top, axis=1)]
    return idx, np.take_along_axis(d2, top, axis=1)


def nearest_neighbor(src_pos: np.ndarray, query_pos: np.ndarray,
                     window: int = 8) -> np.ndarray:
    """Index of (approximately) nearest src point per query point."""
    idx, _ = knn(src_pos, query_pos, k=1, window=window)
    return idx[:, 0]


def recolour(source: PointCloud, target_positions: np.ndarray,
             source_scale_num: int = 1, source_scale_den: int = 1,
             window: int = 8) -> PointCloud:
    """Transfer source attributes onto target (reconstructed) positions.

    target_positions are in the coding grid; source positions are
    scaled into the same grid for distance computation (reference
    scales via sourceToReconScale, pointset_processing.cpp).
    """
    nt = target_positions.shape[0]
    src_grid = source.positions.astype(np.float64)
    if source_scale_num != source_scale_den:
        src_grid = src_grid * (source_scale_num / source_scale_den)
    src_grid = np.round(src_grid).astype(np.int64)

    # forward: distance-weighted k-NN sources per target (Ψ₁; the
    # reference blends the forward set with inverse-distance weights)
    fwd_idx, fwd_d2 = knn(src_grid, target_positions, k=3,
                          window=window)
    inv = 1.0 / np.maximum(fwd_d2.astype(np.float64), 0.25)
    wsum = inv.sum(axis=1, keepdims=True)
    fwd_w = inv / wsum
    # exact positional match: take that source verbatim
    exact = fwd_d2[:, 0] == 0
    fwd_w[exact] = 0.0
    fwd_w[exact, 0] = 1.0
    # backward: nearest target per source, grouped by target (Ψ₂)
    bwd = nearest_neighbor(target_positions, src_grid, window)

    def transfer(attr):
        if attr is None:
            return None
        a = np.asarray(attr)
        flat = a.reshape(a.shape[0], -1).astype(np.int64)
        c = flat.shape[1]
        fwd_val = np.floor(
            (flat[fwd_idx].astype(np.float64)
             * fwd_w[:, :, None]).sum(axis=1) + 0.5).astype(np.int64)
        sums = np.zeros((nt, c), dtype=np.int64)
        cnts = np.zeros(nt, dtype=np.int64)
        np.add.at(sums, bwd, flat)
        np.add.at(cnts, bwd, 1)
        has_b = cnts > 0
        bwd_val = fwd_val.copy()
        bwd_val[has_b] = ((sums[has_b] + cnts[has_b, None] // 2)
                          // cnts[has_b, None])
        out = (fwd_val + bwd_val + 1) // 2               # blend Ψ₁/Ψ₂
        return out.reshape((nt,) + a.shape[1:]).astype(a.dtype)

    return PointCloud(
        positions=target_positions,
        colors=transfer(source.colors),
        reflectances=transfer(source.reflectances),
    )
