"""Region-Adaptive Hierarchical Transform as segmented pairwise passes.

Counterpart of the reference RAHT (`tmc3/RAHT.cpp`: bottom-up
`reduceUnique/reduceLevel` RAHT.cpp:300-420, per-2x2x2-block butterflies
`fwdTransformBlock222` RAHT.cpp:672-737, driver `uraht_process`
RAHT.cpp:977).  The reference walks 2x2x2 blocks every octree level; an
octree level is exactly three dyadic Morton steps (strip bit z, then y,
then x — our codes are x<<2|y<<1|z), so the whole transform is
``3 * depth`` vectorised pair-merge sweeps over sorted codes:

* nodes sharing a parent at the current dyadic bit are *adjacent rows*
  in the sorted code array — pairing is a single shifted compare,
* the 2-point orthonormal butterfly with subtree weights (w1, w2)
    dc = ( sqrt(w1) v1 + sqrt(w2) v2) / sqrt(w1+w2)
    ac = (-sqrt(w2) v1 + sqrt(w1) v2) / sqrt(w1+w2)
  runs on all pairs of a sweep at once,
* the integer Haar variant (reference `integerHaar`, TMC3.cpp:1284) is
  the reversible pair  ac = v1 - v2 ; dc = v2 + (ac >> 1).

The decoder knows the whole merge structure from the decoded geometry
(weights = subtree point counts), so only coefficients are coded:
[root DC] then ACs from coarsest sweep to finest (a scalable order).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _pair_masks(codes: np.ndarray):
    """codes strictly increasing. Returns (first_of_pair, second_of_pair,
    keep) boolean masks for merging at the lowest bit."""
    parent = codes >> 1
    n = codes.shape[0]
    eq = np.zeros(n, dtype=bool)
    if n > 1:
        eq[:-1] = parent[:-1] == parent[1:]
    first = eq.copy()
    second = np.zeros(n, dtype=bool)
    second[1:] = eq[:-1]
    keep = ~second
    return first, second, keep


def merge_structure(leaf_codes: np.ndarray, depth: int):
    """Geometry-derived transform structure (decoder & encoder share it).

    Returns a list over sweeps s = 0..3*depth-1 (fine -> coarse) of
    dicts with the sweep's input codes, weights, and pair masks.
    """
    codes = leaf_codes.astype(np.int64)
    w = np.ones(codes.shape[0], dtype=np.int64)
    sweeps = []
    for s in range(3 * depth):
        first, second, keep = _pair_masks(codes)
        sweeps.append({
            "codes": codes, "w": w,
            "first": first, "second": second, "keep": keep,
        })
        nw = w.copy()
        nw[first] += w[second]
        codes = (codes >> 1)[keep]
        w = nw[keep]
    return sweeps


def forward(leaf_codes: np.ndarray, values: np.ndarray, depth: int,
            integer_haar: bool = False):
    """values (N, C) -> coefficient array (N, C) in coded order.

    Coded order: [root DC, sweeps from coarsest to finest, ACs in row
    order within a sweep].  Float64 path returns float coefficients
    (caller quantises); Haar path returns exact integers.
    """
    sweeps = merge_structure(leaf_codes, depth)
    vals = values.astype(np.int64 if integer_haar else np.float64)
    if vals.ndim == 1:
        vals = vals[:, None]
    acs_per_sweep: List[np.ndarray] = []
    for sw in sweeps:
        first, second, keep = sw["first"], sw["second"], sw["keep"]
        v1 = vals[first]
        v2 = vals[second]
        if integer_haar:
            ac = v1 - v2
            dc = v2 + (ac >> 1)
        else:
            w1 = sw["w"][first].astype(np.float64)[:, None]
            w2 = sw["w"][second].astype(np.float64)[:, None]
            rs = np.sqrt(w1 + w2)
            a, b = np.sqrt(w1) / rs, np.sqrt(w2) / rs
            dc = a * v1 + b * v2
            ac = -b * v1 + a * v2
        nv = vals.copy()
        nv[first] = dc
        vals = nv[keep]
        acs_per_sweep.append(ac)
    root_dc = vals  # (n_roots, C); n_roots == 1 for a full tree
    out = [root_dc] + [acs_per_sweep[s] for s in
                       range(len(acs_per_sweep) - 1, -1, -1)]
    return np.concatenate(out, axis=0)


def inverse(leaf_codes: np.ndarray, coeffs: np.ndarray, depth: int,
            integer_haar: bool = False):
    """Inverse transform: coefficients (coded order) -> values (N, C)."""
    sweeps = merge_structure(leaf_codes, depth)
    if coeffs.ndim == 1:
        coeffs = coeffs[:, None]
    n_roots = sweeps[-1]["keep"].sum() if sweeps else leaf_codes.shape[0]
    pos = 0
    vals = coeffs[pos:pos + n_roots].copy()
    pos += n_roots
    for s in range(len(sweeps) - 1, -1, -1):
        sw = sweeps[s]
        first, second, keep = sw["first"], sw["second"], sw["keep"]
        n_pairs = int(first.sum())
        ac = coeffs[pos:pos + n_pairs]
        pos += n_pairs
        # vals currently lives on the post-sweep (kept) rows
        expanded = np.zeros((sw["codes"].shape[0], vals.shape[1]),
                            dtype=vals.dtype)
        expanded[keep] = vals
        dc = expanded[first]
        if integer_haar:
            v2 = dc - (ac >> 1)
            v1 = ac + v2
        else:
            w1 = sw["w"][first].astype(np.float64)[:, None]
            w2 = sw["w"][second].astype(np.float64)[:, None]
            rs = np.sqrt(w1 + w2)
            a, b = np.sqrt(w1) / rs, np.sqrt(w2) / rs
            v1 = a * dc - b * ac
            v2 = b * dc + a * ac
        expanded[first] = v1
        expanded[second] = v2
        vals = expanded
    return vals
