"""Benchmark: full codec throughput (geometry encode + decode + RAHT
attributes) in Mpoints/s.

Run on real TPU hardware by the driver.  Baseline: the reference tmc3
runs ~1 Mpoint/s single-core (BASELINE.md); vs_baseline is the speedup
over that.  Prints ONE JSON line; the headline metric is the
round-trip geometry rate N / (t_encode + t_decode), with component
rates as extra fields.

The workload is a surface-like correlated cloud (realistic occupancy
statistics, unlike uniform noise), coded end-to-end to and from real
bitstream bytes with the production host engine (the TPU device engine
emits the identical stream; on this machine the chip sits behind a
~10MB/s tunnel, so the host engine is the honest end-to-end number —
see ops/octree.py and docs/STATUS.md).
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
    from mpeg_pcc_tmc13_tpu.bitstream import entropy, hls
    from mpeg_pcc_tmc13_tpu.models import attributes as attr_model
    from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
    from mpeg_pcc_tmc13_tpu.ops import octree as octree_ops

    depth = 11
    n = 1_000_000
    pos = make_surface_cloud(n, depth)
    rng = np.random.default_rng(1)
    uniq = np.unique(pos, axis=0)

    # geometry encode (native engine, parent contexts)
    t_enc = float("inf")
    data = b""
    order = None
    for _ in range(3):
        enc = entropy.RangeEncoder()
        ctx = go.OctreeContexts()
        t0 = time.perf_counter()
        go.encode(pos, depth, enc, ctx, engine="auto",
                  ctx_mode=octree_ops.CTX_MODE_PARENT,
                  need_order=False)
        data = enc.get_bytes()
        t_enc = min(t_enc, time.perf_counter() - t0)

    # geometry decode
    t_dec = float("inf")
    for _ in range(3):
        dec = entropy.RangeDecoder(data)
        ctx = go.OctreeContexts()
        t0 = time.perf_counter()
        out = go.decode(uniq.shape[0], depth, dec, ctx,
                        ctx_mode=octree_ops.CTX_MODE_PARENT)
        t_dec = min(t_dec, time.perf_counter() - t0)
    assert out.shape[0] == uniq.shape[0]

    # RAHT colour attributes over the decoded geometry
    colors = rng.integers(0, 256, (uniq.shape[0], 3)).astype(np.int64)
    aps = hls.AttributeParameterSet(
        aps_id=0, attr_encoding=hls.AttributeEncoding.RAHT, init_qp=22)
    desc = hls.AttributeDescription(label="color", num_components=3,
                                    bitdepth=8)
    t0 = time.perf_counter()
    payload = attr_model.encode(colors, uniq, aps, desc,
                                attr_model.AttributeContexts())
    t_attr = time.perf_counter() - t0
    assert len(payload) > 0

    geom_rt = n / (t_enc + t_dec) / 1e6
    baseline_mpts = 1.0  # reference tmc3 ~1 Mpoint/s single-core
    print(json.dumps({
        "metric": "geom_roundtrip_throughput",
        "value": round(geom_rt, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(geom_rt / baseline_mpts, 3),
        "geom_encode_mpts": round(n / t_enc / 1e6, 3),
        "geom_decode_mpts": round(n / t_dec / 1e6, 3),
        "raht_encode_mpts": round(uniq.shape[0] / t_attr / 1e6, 3),
        "geom_bpp": round(8 * len(data) / n, 3),
    }))


if __name__ == "__main__":
    main()
