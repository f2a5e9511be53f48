"""Benchmark: end-to-end geometry encode throughput (Mpoints/s).

Run on real TPU hardware by the driver.  Baseline: the reference tmc3
runs ~1 Mpoint/s single-core (BASELINE.md); vs_baseline is the speedup
over that.  Prints ONE JSON line.

The workload is a surface-like correlated cloud (realistic occupancy
statistics, unlike uniform noise), encoded end-to-end: device octree
analysis (jit) + host batched entropy coding -> real bitstream bytes.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_surface_cloud(n: int, depth: int, seed: int = 0) -> np.ndarray:
    """Height-field surface: dense-ish occupancy like CTC solid clouds."""
    rng = np.random.default_rng(seed)
    size = 1 << depth
    side = int(np.sqrt(n)) + 1
    xs = rng.integers(0, size, side * side)
    ys = rng.integers(0, size, side * side)
    # smooth height field from a few random harmonics
    fx = rng.uniform(0.5, 3.0, 4)
    fy = rng.uniform(0.5, 3.0, 4)
    ph = rng.uniform(0, 2 * np.pi, 4)
    am = rng.uniform(0.05, 0.25, 4)
    z = np.zeros(side * side)
    for i in range(4):
        z += am[i] * np.sin(2 * np.pi * fx[i] * xs / size
                            + 2 * np.pi * fy[i] * ys / size + ph[i])
    zs = ((z - z.min()) / (z.max() - z.min() + 1e-9) * (size - 1)).astype(
        np.int64)
    pos = np.stack([xs, ys, zs], axis=1)[:n]
    return pos.astype(np.int64)


def main():
    from mpeg_pcc_tmc13_tpu.bitstream import entropy
    from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
    from mpeg_pcc_tmc13_tpu.ops import octree as octree_ops

    depth = 11
    n = 1_000_000
    pos = make_surface_cloud(n, depth)

    # Production fast path: native C++ tree walk + range coder, parent
    # contexts (the TPU device engine emits the identical stream; on
    # this machine the chip sits behind a ~10MB/s tunnel, so the host
    # engine is the honest end-to-end number — see ops/octree.py).
    best = 0.0
    nbytes = 0
    for _ in range(4):
        enc = entropy.RangeEncoder()
        ctx = go.OctreeContexts()
        t0 = time.perf_counter()
        go.encode(pos, depth, enc, ctx, engine="auto",
                  ctx_mode=octree_ops.CTX_MODE_PARENT,
                  need_order=False)
        data = enc.get_bytes()
        dt = time.perf_counter() - t0
        best = max(best, n / dt / 1e6)
        nbytes = len(data)
    assert nbytes > 0

    baseline_mpts = 1.0  # reference tmc3 ~1 Mpoint/s single-core
    print(json.dumps({
        "metric": "geometry_encode_throughput",
        "value": round(best, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(best / baseline_mpts, 3),
    }))


if __name__ == "__main__":
    main()
