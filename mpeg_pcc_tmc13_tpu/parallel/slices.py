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

try:                                    # jax >= 0.4.35 public API
    from jax import shard_map as _shard_map
    _CHECK_KW = "check_vma"
except ImportError:                     # older: experimental module
    from jax.experimental.shard_map import shard_map as _shard_map
    _CHECK_KW = "check_rep"


def shard_map(f=None, **kw):
    """Version-portable shard_map (check_rep was renamed check_vma)."""
    if "check_rep" in kw:
        kw[_CHECK_KW] = kw.pop("check_rep")
    return _shard_map(f, **kw) if f is not None else _shard_map(**kw)

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


def sharded_encode_analysis_inter(slice_codes, depth: int,
                                  slice_ref_codes, ref_counts,
                                  mesh: Mesh, axis: str = "slices"):
    """Inter-frame sharded analysis: per-slice occupancy + predOcc
    contexts from each slice's motion-compensated reference block
    (device form of the reference predOccupancy path,
    geometry_octree_encoder.cpp:1875-1918).

    slice_ref_codes (S, M): sorted reference codes per slice, padded
    with INT64_MAX past ref_counts[s].
    """

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis)),
             out_specs={k: P(axis, None, None) for k in
                        ("occ", "ctx_base", "node_mask", "node_code")},
             check_rep=False)
    def run(block, refs, rc):
        return jax.vmap(
            lambda c, r, k: ops.encode_analysis_inter_jax(
                c, depth, r, k))(block, refs, rc)

    return jax.jit(run)(slice_codes, slice_ref_codes, ref_counts)


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


def sharded_raht_fp_blocks(vals, weights, mesh: Mesh,
                           axis: str = "slices"):
    """Fixed-point RAHT block stage COMPILED on the mesh.

    vals (S, B, 8, C) int64 Q13 block values, weights (S, B, 8) int64:
    each device runs the integer butterfly network
    (ops.raht_fp_device.fwd_blocks_int — plain XLA, no interpret mode)
    on its slices.  Returns (dc (S,B,C), acz, acy, acx) with the slice
    axis preserved; bit-identical to the host fp spec."""
    from ..ops import raht_fp_device as fpd

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None, None, None), P(axis, None, None)),
             out_specs=(P(axis, None, None), P(axis, None, None, None),
                        P(axis, None, None, None),
                        P(axis, None, None, None)),
             check_rep=False)
    def run(v, w):
        ls, b, _, c = v.shape
        dc, az, ay, ax = fpd.fwd_blocks_int(
            v.reshape(-1, 8, c), w.reshape(-1, 8))
        return (dc.reshape(ls, b, c), az.reshape(ls, b, 4, c),
                ay.reshape(ls, b, 2, c), ax.reshape(ls, b, 1, c))

    return jax.jit(run)(vals, weights)


def sharded_slice_codec_roundtrip(codes_sorted: np.ndarray, depth: int,
                                  mesh: Mesh, n_slices: int,
                                  axis: str = "slices"):
    """Full sharded codec round-trip: device-sharded per-slice
    analysis -> host entropy per slice -> per-slice payload bytes ->
    single-device decode -> equality with the input cloud.

    This is the end-to-end form of the framework's multi-chip layout
    (slices = the standard's parallelism unit, partitioning.cpp:120):
    every context input is computed on the mesh; the host stage only
    replays entropy coding per slice and concatenates the payloads in
    slice order, exactly as the reference concatenates per-slice
    bricks (encoder.cpp:1503-1529).  Returns the payload list.
    """
    from ..bitstream import entropy as ent
    from ..models import geometry_octree as go
    from ..utils import morton

    uniq = np.unique(codes_sorted)
    blocks = partition_codes_padded(uniq, n_slices)
    res, _hist = sharded_encode_analysis(blocks, depth, mesh)
    occ = np.asarray(res["occ"])
    base = np.asarray(res["ctx_base"])
    mask = np.asarray(res["node_mask"])

    per = blocks.shape[1]
    payloads = []
    slice_uniq = []
    for s in range(n_slices):
        su = np.unique(blocks[s])
        slice_uniq.append(su)
        enc = ent.RangeEncoder()
        ctx = go.OctreeContexts()
        for l in range(occ.shape[1]):
            m = mask[s, l]
            if not m.any():
                continue
            enc.occupancy_sym(ctx.occupancy_sym,
                              base[s, l][m].astype(np.int32),
                              occ[s, l][m].astype(np.uint8))
        payloads.append(enc.get_bytes())

    # the device-analysis stream must equal the host engine's bytes
    # for the same slice (identical contexts by construction)
    for s in range(n_slices):
        enc = ent.RangeEncoder()
        go.encode(morton.decode(slice_uniq[s]), depth, enc,
                  go.OctreeContexts(), unique_points=True,
                  engine="numpy", need_order=False)
        if enc.get_bytes() != payloads[s]:
            raise AssertionError(f"slice {s}: device-analysis bytes "
                                 "differ from host engine")

    # single-device decode of the concatenated per-slice payloads
    got = []
    for s in range(n_slices):
        dec = ent.RangeDecoder(payloads[s])
        pts = go.decode(int(slice_uniq[s].size), depth, dec,
                        go.OctreeContexts(), unique_points=True,
                        engine="numpy")
        got.append(morton.encode(pts))
    got = np.unique(np.concatenate(got))
    if not np.array_equal(got, uniq):
        raise AssertionError("sharded codec round-trip mismatch")
    return payloads
