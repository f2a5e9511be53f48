#!/usr/bin/env python3
"""Point-cloud objective quality metric (pc_error equivalent).

Counterpart of the MPEG pc_error tool the reference CTC scripts call
(Makefile.tmc13-step's distortion step): computes the D1
(point-to-point) and D2 (point-to-plane) geometry PSNRs plus per
attribute-channel PSNRs between a source and a reconstruction.

Conventions (matching pc_error defaults):
  * symmetric metric: max of the two directional MSEs,
  * geometry PSNR peak: the signalled resolution (--resolution), else
    the source bounding-box diagonal,
  * D2 normals: estimated by local PCA over the k nearest neighbours
    when the source PLY carries none (pc_error reads them from the
    file; estimation is this tool's self-contained equivalent).

Usage:
  python tools/pc_error.py --fileA src.ply --fileB rec.ply \
      [--resolution 1023] [--color 1]
Prints reference-shaped lines: `mseF,PSNR (p2point): <dB>` etc.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mpeg_pcc_tmc13_tpu.ops.recolour import knn  # noqa: E402
from mpeg_pcc_tmc13_tpu.utils import ply  # noqa: E402


def _nn(a: np.ndarray, b: np.ndarray, k: int = 1, window: int = 32):
    idx, d2 = knn(b, a, k=k, window=window)
    return idx, d2.astype(np.float64)


def estimate_normals(points: np.ndarray, k: int = 9,
                     window: int = 32) -> np.ndarray:
    """Unit normals by local PCA (smallest eigenvector of the k-NN
    scatter)."""
    idx, _ = _nn(points, points, k=k, window=window)
    nbrs = points[idx].astype(np.float64)          # (N,k,3)
    mean = nbrs.mean(axis=1, keepdims=True)
    d = nbrs - mean
    cov = np.einsum("nki,nkj->nij", d, d) / k
    # eigh is batched; smallest eigenvalue's vector is the normal
    w, v = np.linalg.eigh(cov)
    n = v[:, :, 0]
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(norm, 1e-12)


def directional(a: ply.PlyCloud, b: ply.PlyCloud, normals_a=None,
                window: int = 32):
    """a -> b errors: (d1_mse, d2_mse, per-channel attr sse/count)."""
    pa = a.positions.astype(np.float64)
    pb = b.positions.astype(np.float64)
    idx, d2 = _nn(pa.astype(np.int64), pb.astype(np.int64), 1, window)
    nn_idx = idx[:, 0]
    diff = pb[nn_idx] - pa
    d1_mse = float((diff * diff).sum(axis=1).mean())
    d2_mse = None
    if normals_a is not None:
        proj = (diff * normals_a).sum(axis=1)
        d2_mse = float((proj * proj).mean())
    attr_mse = {}
    if a.colors is not None and b.colors is not None:
        ca = a.colors.astype(np.float64)
        cb = b.colors[nn_idx].astype(np.float64)
        for ch, name in enumerate(("y", "u", "v")):   # raw channels
            e = ca[:, ch] - cb[:, ch]
            attr_mse[f"c[{ch}]"] = float((e * e).mean())
    if a.reflectances is not None and b.reflectances is not None:
        e = (a.reflectances.astype(np.float64)
             - b.reflectances[nn_idx].astype(np.float64))
        attr_mse["reflectance"] = float((e * e).mean())
    return d1_mse, d2_mse, attr_mse


def psnr(mse: float, peak: float) -> float:
    if mse <= 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def compute(a: ply.PlyCloud, b: ply.PlyCloud, resolution: float = None,
            with_d2: bool = True, window: int = 32):
    if resolution is None:
        ext = a.positions.max(axis=0) - a.positions.min(axis=0)
        resolution = float(np.sqrt((ext * ext).sum()))
    na = estimate_normals(a.positions.astype(np.int64),
                          window=window) if with_d2 else None
    nb = estimate_normals(b.positions.astype(np.int64),
                          window=window) if with_d2 else None
    d1_ab, d2_ab, attr_ab = directional(a, b, na, window)
    d1_ba, d2_ba, attr_ba = directional(b, a, nb, window)
    out = {
        "d1_mse": max(d1_ab, d1_ba),
        "d1_psnr": psnr(max(d1_ab, d1_ba), resolution),
    }
    if with_d2:
        out["d2_mse"] = max(d2_ab, d2_ba)
        out["d2_psnr"] = psnr(max(d2_ab, d2_ba), resolution)
    for key in attr_ab:
        m = max(attr_ab[key], attr_ba.get(key, 0.0))
        peak = 255.0
        out[f"{key}_psnr"] = psnr(m, peak)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--fileA", required=True, help="source PLY")
    ap.add_argument("--fileB", required=True, help="reconstruction PLY")
    ap.add_argument("--resolution", type=float, default=None,
                    help="geometry PSNR peak (default: bbox diagonal)")
    ap.add_argument("--color", type=int, default=1)
    ap.add_argument("--noD2", action="store_true")
    args = ap.parse_args(argv)
    a = ply.read(args.fileA)
    b = ply.read(args.fileB)
    r = compute(a, b, args.resolution, with_d2=not args.noD2)
    print(f"mseF      (p2point): {r['d1_mse']:.6f}")
    print(f"mseF,PSNR (p2point): {r['d1_psnr']:.4f}")
    if "d2_psnr" in r:
        print(f"mseF      (p2plane): {r['d2_mse']:.6f}")
        print(f"mseF,PSNR (p2plane): {r['d2_psnr']:.4f}")
    for k, v in r.items():
        if k.endswith("_psnr") and not k.startswith(("d1", "d2")):
            print(f"PSNR {k[:-5]}: {v:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
