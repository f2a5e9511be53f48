"""Multi-chip slice sharding: mesh SPMD forms + per-device placement.

Runs on the conftest 8-virtual-CPU-device mesh.  Every sharded result
must equal the host engines byte-for-byte / bit-for-bit — device
sharding is layout, never syntax (SURVEY.md §2.9: slices are the
standard's parallelism unit, reference partitioning.cpp).
"""

import subprocess
import sys

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.utils import morton


def _codes(n, depth, seed=9):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    return np.unique(morton.encode(pos))


def test_sharded_slice_codec_roundtrip():
    """Mesh-sharded analysis -> per-slice payloads == host engine's,
    decode recovers the cloud."""
    from mpeg_pcc_tmc13_tpu.parallel import slices as par

    depth = 6
    codes = _codes(1500, depth)
    mesh = par.make_mesh(4, backend="cpu")
    payloads = par.sharded_slice_codec_roundtrip(codes, depth, mesh, 4)
    assert len(payloads) == 4 and all(len(p) > 0 for p in payloads)


def test_sharded_inter_analysis_matches_numpy():
    """predOcc contexts from the mesh equal ops.pred_occupancy_np per
    level (inter path on the mesh)."""
    import jax.numpy as jnp
    from mpeg_pcc_tmc13_tpu.ops import octree as ops
    from mpeg_pcc_tmc13_tpu.parallel import slices as par

    depth = 5
    rng = np.random.default_rng(3)
    mesh = par.make_mesh(2, backend="cpu")
    cur = _codes(500, depth, seed=4)
    ref = _codes(500, depth, seed=5)
    blocks = par.partition_codes_padded(cur, 2)
    M = 512
    refs = np.full((2, M), np.iinfo(np.int64).max, dtype=np.int64)
    counts = np.zeros(2, dtype=np.int32)
    for s in range(2):
        lo, hi = blocks[s].min(), blocks[s].max()
        rs = ref[(ref >= lo) & (ref <= hi)]
        refs[s, :rs.size] = rs
        counts[s] = rs.size
    res = par.sharded_encode_analysis_inter(
        jnp.asarray(blocks), depth, jnp.asarray(refs),
        jnp.asarray(counts), mesh)
    occ = np.asarray(res["occ"])
    base = np.asarray(res["ctx_base"])
    mask = np.asarray(res["node_mask"])
    for s in range(2):
        su = np.unique(blocks[s])
        rs = refs[s, :counts[s]]
        levels = ops.build_levels_np(su, depth, ops.CTX_MODE_PARENT)
        for l, lvl in enumerate(levels):
            ref_l1 = np.unique(rs >> (3 * (depth - l - 1)))
            pred = ops.pred_occupancy_np(lvl["nodes"], ref_l1)
            want = ((lvl["nodes"] & 7).astype(np.int32) << 8) | pred
            m = mask[s, l]
            assert np.array_equal(occ[s, l][m], lvl["occ"])
            assert np.array_equal(base[s, l][m], want)


def test_sharded_raht_fp_blocks_compiled_bit_exact():
    """The compiled (non-interpret) integer RAHT block stage on the
    mesh equals the numpy fixed-point butterflies."""
    import jax.numpy as jnp
    from mpeg_pcc_tmc13_tpu.ops import raht_fp
    from mpeg_pcc_tmc13_tpu.parallel import slices as par

    rng = np.random.default_rng(7)
    S, B, C = 4, 16, 3
    mesh = par.make_mesh(S, backend="cpu")
    w = rng.integers(0, 5, (S, B, 8)).astype(np.int64)
    w[:, :, 0] = np.maximum(w[:, :, 0], 1)     # nonempty blocks
    v = rng.integers(-1 << 20, 1 << 20, (S, B, 8, C)).astype(np.int64)
    v[w == 0] = 0
    dc, az, ay, ax = par.sharded_raht_fp_blocks(
        jnp.asarray(v), jnp.asarray(w), mesh)
    dc = np.asarray(dc)

    # host reference: run each block through the raht_fp pair law
    def stage(v0, v1, w0, w1):
        if w0 and w1:
            a, b = raht_fp.ab_q15(np.int64(w0), np.int64(w1))
            d = (a * v0 + b * v1 + (1 << 14)) >> 15
            c = (a * v1 - b * v0 + (1 << 14)) >> 15
            return d, c
        return (v0 if w0 else v1), None

    for s in range(S):
        for bi in range(B):
            vals = list(v[s, bi])
            ws = list(w[s, bi])
            zc, zw = [], []
            for xy in range(4):
                d, _ = stage(vals[2 * xy], vals[2 * xy + 1],
                             ws[2 * xy], ws[2 * xy + 1])
                zc.append(d)
                zw.append(ws[2 * xy] + ws[2 * xy + 1])
            yc, yw = [], []
            for x in range(2):
                d, _ = stage(zc[2 * x], zc[2 * x + 1],
                             zw[2 * x], zw[2 * x + 1])
                yc.append(d)
                yw.append(zw[2 * x] + zw[2 * x + 1])
            d, _ = stage(yc[0], yc[1], yw[0], yw[1])
            assert np.array_equal(dc[s, bi], d)


@pytest.mark.parametrize("n_slices,n_dev", [(3, 2), (5, 4)])
def test_encode_frame_sharded_uneven(n_slices, n_dev):
    """Per-device placement: uneven slice sizes, geometry + fp-RAHT
    attribute payloads byte-equal to the host engines."""
    from mpeg_pcc_tmc13_tpu.bitstream import entropy
    from mpeg_pcc_tmc13_tpu.models import geometry_octree as go
    from mpeg_pcc_tmc13_tpu.models.attributes import AttributeContexts
    from mpeg_pcc_tmc13_tpu.ops import raht_fp
    from mpeg_pcc_tmc13_tpu.parallel import frame as pframe

    depth = 6
    rng = np.random.default_rng(11)
    steps = [9000, 12000, 12000]
    slice_codes, slice_vals = [], []
    for s in range(n_slices):
        codes = _codes(200 + 137 * s, depth, seed=20 + s)
        slice_codes.append(codes)
        slice_vals.append(
            rng.integers(0, 256, (codes.size, 3)).astype(np.int64))
    devs = pframe.devices_for(n_dev, backend="cpu")
    geom, attr = pframe.encode_frame_sharded(
        slice_codes, depth, devs, values=slice_vals,
        steps_q16=steps, num_threads=n_dev)
    for s in range(n_slices):
        # geometry: host occ_stream bytes
        enc = entropy.RangeEncoder()
        ctx = go.OctreeContexts()
        go.encode(morton.decode(slice_codes[s]), depth, enc, ctx,
                  unique_points=True, engine="numpy",
                  need_order=False, ctx_mode=1)
        # attribute: host fp spec bytes
        aenc = entropy.RangeEncoder()
        actx = AttributeContexts()
        raht_fp.forward_predicted_fp(
            slice_codes[s], slice_vals[s], depth,
            lambda c, tag: steps[c],
            emit=lambda q, tag: aenc.zrow_residuals(
                actx.zrow, q.astype(np.int32)))
        assert attr[s] == aenc.get_bytes(), f"slice {s} attr bytes"


def test_decode_frame_sharded_roundtrip():
    from mpeg_pcc_tmc13_tpu.parallel import frame as pframe

    depth = 6
    slice_codes = [_codes(300, depth, seed=31),
                   _codes(500, depth, seed=32),
                   _codes(120, depth, seed=33)]
    devs = pframe.devices_for(2, backend="cpu")
    geom, _ = pframe.encode_frame_sharded(slice_codes, depth, devs)
    nmax = max(c.size for c in slice_codes) + 64
    outs = pframe.decode_frame_sharded(geom, depth, devs, nmax)
    for s, (nodes, cnt) in enumerate(outs):
        got = np.asarray(nodes)[:int(np.asarray(cnt))]
        assert np.array_equal(got, slice_codes[s])


def test_cli_shard_devices_stream_identical(tmp_path):
    """--shardDevices routes slice workers over the device mesh; the
    emitted bitstream must equal the sequential single-device encode
    byte-for-byte."""
    from mpeg_pcc_tmc13_tpu.utils import ply

    rng = np.random.default_rng(40)
    pos = np.unique(rng.integers(0, 256, (5000, 3)).astype(np.int64),
                    axis=0)
    pc = ply.PlyCloud(positions=pos)
    inp = tmp_path / "in.ply"
    ply.write(pc, str(inp), ascii=True)
    common = [sys.executable, "-m", "mpeg_pcc_tmc13_tpu.runtime.cli",
              "--mode=0", f"--uncompressedDataPath={inp}",
              "--sliceMaxPoints=1500", "--mergeDuplicatedPoints=1"]
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4")
    seq = tmp_path / "seq.bin"
    shd = tmp_path / "shd.bin"
    for out, extra in ((seq, []),
                       (shd, ["--shardDevices=4", "--geomEngine=device"])):
        r = subprocess.run(
            common + [f"--compressedStreamPath={out}"] + extra,
            capture_output=True, text=True, env=env,
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
    assert seq.read_bytes() == shd.read_bytes()
