"""Global motion estimation & compensation.

Counterpart of `tmc3/motionWip.cpp`: LMS-based global motion matrix
estimation (`SearchGlobalMotion`/LMS3D, motionWip.h:72-97) and
`applyGlobalMotion` (motionWip.h:57,101).  The reference also accepts
per-frame matrices from a file (MotionParameters::parseFile,
geometry_params.h:73-112) — mirrored by `MotionParameters` here.

Estimation is encoder-only (non-normative): correspondences from a
Morton-window nearest-neighbour search on subsampled clouds, then a
least-squares affine fit.  The signalled matrix is Q16 fixed point so
compensation is bit-identical on both sides (decoder applies it with
integer arithmetic only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from . import recolour as recolour_ops

Q = 16
ONE = 1 << Q


def identity_motion():
    mat = np.zeros((3, 3), dtype=np.int64)
    mat[0, 0] = mat[1, 1] = mat[2, 2] = ONE
    return mat, np.zeros(3, dtype=np.int64)


def estimate_global_motion(ref_positions: np.ndarray,
                           cur_positions: np.ndarray,
                           max_samples: int = 2000):
    """Least-squares affine ref->cur fit (encoder heuristic).

    Returns (mat_q16 (3,3) int64, trans (3,) int64).  Mirrors the role
    of the reference's LMS3D (motionWip.h:72); the matrix rides in the
    GBH like the reference's gm_matrix/gm_trans.
    """
    nr, nc = ref_positions.shape[0], cur_positions.shape[0]
    if nr < 16 or nc < 16:
        return identity_motion()
    step_r = max(nr // max_samples, 1)
    sample = ref_positions[::step_r].astype(np.int64)
    nn = recolour_ops.nearest_neighbor(cur_positions, sample)
    target = cur_positions[nn].astype(np.float64)
    src = sample.astype(np.float64)
    # robust trim: drop worst-matching half
    d2 = np.sum((target - src) ** 2, axis=1)
    keep = d2 <= np.median(d2)
    src, target = src[keep], target[keep]
    if src.shape[0] < 8:
        return identity_motion()
    a = np.concatenate([src, np.ones((src.shape[0], 1))], axis=1)
    sol, *_ = np.linalg.lstsq(a, target, rcond=None)   # (4,3)
    mat = np.round(sol[:3].T * ONE).astype(np.int64)   # (3,3) row-major
    trans = np.round(sol[3]).astype(np.int64)
    return mat, trans


def apply_global_motion(positions: np.ndarray, mat_q16: np.ndarray,
                        trans: np.ndarray) -> np.ndarray:
    """Integer-exact compensation (decoder-side normative path):
    out = (mat @ p) >> Q + trans, rounding toward nearest."""
    p = positions.astype(np.int64)
    acc = p @ mat_q16.T.astype(np.int64)
    out = (acc + (1 << (Q - 1))) >> Q
    return out + trans[None, :]


@dataclass
class MotionParameters:
    """Per-frame external motion matrices (reference
    MotionParameters::parseFile, geometry_params.h:73-112: 14 numbers
    per frame — 3x3 matrix, 3 translation, 2 thresholds)."""
    entries: List[Tuple[np.ndarray, np.ndarray, Tuple[int, int]]] = None

    @staticmethod
    def parse_file(path: str) -> "MotionParameters":
        entries = []
        with open(path) as f:
            vals: List[float] = []
            for tok in f.read().split():
                vals.append(float(tok))
        for i in range(0, len(vals) - 13, 14):
            mat = np.round(np.asarray(
                vals[i:i + 9], dtype=np.float64).reshape(3, 3)
                * ONE).astype(np.int64)
            trans = np.round(np.asarray(
                vals[i + 9:i + 12], dtype=np.float64)).astype(np.int64)
            thresh = (int(vals[i + 12]), int(vals[i + 13]))
            entries.append((mat, trans, thresh))
        return MotionParameters(entries)

    def for_frame(self, idx: int):
        if not self.entries:
            return identity_motion()
        mat, trans, _ = self.entries[min(idx, len(self.entries) - 1)]
        return mat, trans
