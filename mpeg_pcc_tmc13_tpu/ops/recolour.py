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

from dataclasses import dataclass

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


@dataclass
class RecolourParams:
    """The reference's 13 recolour* options (TMC3.cpp:1501-1549,
    defaults from there; algorithm pointset_processing.cpp:230+)."""
    num_neighbours_fwd: int = 8
    num_neighbours_bwd: int = 1
    use_dist_weighted_avg_fwd: bool = True
    use_dist_weighted_avg_bwd: bool = True
    skip_avg_if_identical_fwd: bool = True
    skip_avg_if_identical_bwd: bool = False
    dist_offset_fwd: float = 4.0
    dist_offset_bwd: float = 4.0
    max_geometry_dist2_fwd: float = 1000.0
    max_geometry_dist2_bwd: float = 1000.0
    max_attribute_dist2_fwd: float = 1000.0
    max_attribute_dist2_bwd: float = 1000.0


def recolour(source: PointCloud, target_positions: np.ndarray,
             source_scale_num: int = 1, source_scale_den: int = 1,
             window: int = 8,
             params: RecolourParams = None) -> PointCloud:
    """Transfer source attributes onto target (reconstructed) positions.

    target_positions are in the coding grid; source positions are
    scaled into the same grid for distance computation (reference
    scales via sourceToReconScale, pointset_processing.cpp).

    Forward set Ψ₁: the num_neighbours_fwd nearest sources per target,
    geometry-distance capped, attribute-distance capped against the
    nearest source, inverse-distance weighted (offset dist_offset_fwd);
    an exact positional match short-circuits when
    skip_avg_if_identical_fwd.  Backward set Ψ₂: sources whose nearest
    target this is, same caps/weights.  Final value = mean of the two
    (reference blend, pointset_processing.cpp:432-448).
    """
    p = params or RecolourParams()
    nt = target_positions.shape[0]
    src_grid = source.positions.astype(np.float64)
    if source_scale_num != source_scale_den:
        src_grid = src_grid * (source_scale_num / source_scale_den)
    src_grid = np.round(src_grid).astype(np.int64)

    kf = max(int(p.num_neighbours_fwd), 1)
    fwd_idx, fwd_d2 = knn(src_grid, target_positions, k=kf,
                          window=max(window, kf))
    # backward: nearest target per source, grouped by target (Ψ₂)
    bwd_idx, bwd_d2 = knn(target_positions, src_grid, k=1, window=window)
    bwd, bwd_d2 = bwd_idx[:, 0], bwd_d2[:, 0].astype(np.float64)
    bwd_ok = bwd_d2 <= p.max_geometry_dist2_bwd
    if p.use_dist_weighted_avg_bwd:
        bwd_w = 1.0 / (p.dist_offset_bwd + bwd_d2)
    else:
        bwd_w = np.ones(bwd_d2.shape[0], dtype=np.float64)
    bwd_w = np.where(bwd_ok, bwd_w, 0.0)

    d2f = fwd_d2.astype(np.float64)
    ok_f = d2f <= p.max_geometry_dist2_fwd
    if p.use_dist_weighted_avg_fwd:
        base_w = 1.0 / (p.dist_offset_fwd + d2f)
    else:
        base_w = np.ones_like(d2f)
    exact = fwd_d2[:, 0] == 0

    def transfer(attr):
        if attr is None:
            return None
        a = np.asarray(attr)
        flat = a.reshape(a.shape[0], -1).astype(np.int64)
        c = flat.shape[1]
        sv = flat[fwd_idx].astype(np.float64)            # (T, k, C)
        # attribute-distance cap against the nearest source's value
        ad2 = ((sv - sv[:, :1]) ** 2).sum(axis=-1)
        w = base_w * (ok_f & (ad2 <= p.max_attribute_dist2_fwd))
        w[:, 0] = np.where(ok_f[:, 0], base_w[:, 0], 0.0)
        if p.skip_avg_if_identical_fwd:
            w[exact] = 0.0
            w[exact, 0] = 1.0
        wsum = np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        fwd_val = np.floor((sv * (w / wsum)[:, :, None]).sum(axis=1)
                           + 0.5).astype(np.int64)
        # backward accumulation with attribute cap vs the forward value
        sav = flat.astype(np.float64)
        bd = ((sav - fwd_val[bwd].astype(np.float64)) ** 2).sum(axis=-1)
        wb = np.where(bd <= p.max_attribute_dist2_bwd, bwd_w, 0.0)
        sums = np.zeros((nt, c), dtype=np.float64)
        wcnt = np.zeros(nt, dtype=np.float64)
        np.add.at(sums, bwd, sav * wb[:, None])
        np.add.at(wcnt, bwd, wb)
        has_b = wcnt > 0
        bwd_val = fwd_val.copy()
        bwd_val[has_b] = np.floor(
            sums[has_b] / wcnt[has_b, None] + 0.5).astype(np.int64)
        out = (fwd_val + bwd_val + 1) // 2               # blend Ψ₁/Ψ₂
        return out.reshape((nt,) + a.shape[1:]).astype(a.dtype)

    return PointCloud(
        positions=target_positions,
        colors=transfer(source.colors),
        reflectances=transfer(source.reflectances),
    )
