"""Slice-parallel encoding over a jax device Mesh.

Slices are the standard's parallelism unit (reference partitioning.cpp;
SURVEY.md §2.9): each slice is independently decodable, so the geometry
analysis for S slices shards embarrassingly over devices.  The only
cross-device traffic is an all-reduce of per-slice context statistics
(used to prime adaptive probabilities), which rides ICI via psum —
mirroring how the reference chains slice entropy contexts
(entropy continuation, encoder.cpp:1401-1411) without the serial chain.

Layout: a (S, N) tensor of padded, Morton-sorted slice codes, sharded
P('slices', None); each device runs the full-depth octree analysis on
its slices (vmap over the local block).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import octree as ops


def make_mesh(n_devices: int | None = None, axis: str = "slices",
              backend: str | None = None) -> Mesh:
    """Build a 1-D slice mesh.  Pass backend="cpu" for hermetic dry
    runs/tests so an experimental accelerator plugin (whose runtime may
    not even match) is never grabbed implicitly."""
    devs = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} {backend or 'default'} devices, "
                f"have {len(devs)} (set XLA_FLAGS="
                f"--xla_force_host_platform_device_count=N for cpu)")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _analysis_with_stats(codes: jnp.ndarray, depth: int):
    """Per-slice analysis + context-base histogram (for priming)."""
    res = ops.encode_analysis_jax(codes, depth)
    mask = res["node_mask"]
    base = res["ctx_base"]
    hist = jnp.zeros((ops.NUM_OCC_BASES,), jnp.int32)
    hist = hist.at[jnp.where(mask, base, 0).reshape(-1)].add(
        mask.reshape(-1).astype(jnp.int32))
    return res, hist


def sharded_encode_analysis(slice_codes, depth: int, mesh: Mesh,
                            axis: str = "slices"):
    """(S, N) sorted padded codes -> per-slice analysis + global stats.

    Pad a slice's tail with repeats of its last code (repeats collapse
    into the same leaf, adding no tree nodes but keeping shapes static).
    Returns (stacked analysis dict, global context-base histogram).
    """

    @partial(shard_map, mesh=mesh,
             in_specs=P(axis, None),
             out_specs=(
                 {k: P(axis, None, None) for k in
                  ("occ", "ctx_base", "node_mask", "node_code")},
                 P()),
             check_rep=False)
    def run(block):
        res, hist = jax.vmap(
            lambda c: _analysis_with_stats(c, depth))(block)
        # hist: (local_S, B) -> reduce locally then across devices (ICI)
        ghist = jax.lax.psum(jnp.sum(hist, axis=0), axis)
        return res, ghist

    f = jax.jit(run)
    return f(slice_codes)


def partition_codes_padded(codes_sorted: np.ndarray, n_slices: int):
    """Host-side: split sorted codes into S contiguous, padded rows."""
    n = codes_sorted.shape[0]
    per = -(-n // n_slices)
    out = np.empty((n_slices, per), dtype=np.int64)
    for s in range(n_slices):
        chunk = codes_sorted[s * per:(s + 1) * per]
        if chunk.size == 0:
            chunk = codes_sorted[-1:]
        out[s, :chunk.size] = chunk
        out[s, chunk.size:] = chunk[-1]
    return out


def sharded_raht_blocks(vals, weights, mesh: Mesh, axis: str = "slices",
                        interpret: bool = False):
    """Shard the Pallas RAHT butterfly over the mesh.

    vals (S, B, 8, C) float32 per-slice blocks, weights (S, B, 8):
    each device runs the fused butterfly kernel on its slices'
    flattened blocks — geometry analysis + attribute transform are
    then both mesh-parallel (the slice axis is the standard's
    parallelism unit).  Returns (coeffs, wout, ac_mask) with the
    slice axis preserved.
    """
    from ..ops import pallas_raht

    s, b, _, c = vals.shape

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None, None, None), P(axis, None, None)),
             out_specs=(P(axis, None, None, None), P(axis, None, None),
                        P(axis, None, None)),
             check_rep=False)
    def run(v, w):
        ls = v.shape[0]
        cv, cw, mask = pallas_raht.fwd_blocks(
            v.reshape(-1, 8, c), w.reshape(-1, 8), interpret=interpret)
        return (cv.reshape(ls, b, 8, c), cw.reshape(ls, b, 8),
                mask.reshape(ls, b, 8))

    return jax.jit(run, static_argnums=())(vals, weights)
