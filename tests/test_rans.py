"""On-device interleaved-rANS geometry engine (ops/octree_rans,
models/geometry_rans, --geomEngine=rans).

The rANS engine keeps analysis, context modelling AND entropy coding on
the accelerator; these tests run it in CPU-compiled XLA (conftest
forces JAX_PLATFORMS=cpu) and check the full stack: kernel round trip,
brick payload wrapper, CLI interop, and rate sanity vs the host
adaptive coder (reference counterpart: the serial arithmetic geometry
payload, geometry_octree_encoder.cpp:1853-2660)."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.models import geometry_rans
from mpeg_pcc_tmc13_tpu.ops import octree as octree_ops
from mpeg_pcc_tmc13_tpu.ops import octree_rans
from mpeg_pcc_tmc13_tpu.utils import morton, ply


def _uniq_codes(pos):
    return octree_ops.unique_sorted(np.sort(morton.encode(pos)))


@pytest.mark.parametrize("n,depth,lanes", [
    (1, 4, 64), (63, 5, 64), (500, 6, 64), (4000, 9, 128)])
def test_kernel_roundtrip(n, depth, lanes):
    rng = np.random.default_rng(n)
    pos = rng.integers(0, 1 << depth, (n, 3)).astype(np.int64)
    uniq = _uniq_codes(pos)
    nodes, used = octree_rans.roundtrip_host(uniq, depth, lanes=lanes)
    np.testing.assert_array_equal(nodes, uniq)
    assert used >= 4 * (depth + lanes + 1)


def test_kernel_roundtrip_surface():
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(
        __file__).resolve().parents[1]))
    from bench import make_surface_cloud
    depth = 10
    pos = make_surface_cloud(50000, depth)
    uniq = _uniq_codes(pos)
    nodes, used = octree_rans.roundtrip_host(uniq, depth, lanes=256)
    np.testing.assert_array_equal(nodes, uniq)


def test_model_roundtrip_with_duplicates():
    rng = np.random.default_rng(11)
    depth = 7
    pos = rng.integers(0, 1 << depth, (2000, 3)).astype(np.int64)
    pos = np.concatenate([pos, pos[:100]])           # duplicates
    payload = geometry_rans.encode(pos, depth)
    out = geometry_rans.decode(payload, pos.shape[0], depth)
    np.testing.assert_array_equal(
        morton.encode(out), _uniq_codes(pos))


def test_rate_sane_vs_host_engine():
    """Tile-causal tables must stay within 25% of the host per-symbol
    adaptive coder on a surface-like cloud (measured ~9%)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(
        __file__).resolve().parents[1]))
    from bench import make_surface_cloud
    from mpeg_pcc_tmc13_tpu.bitstream import entropy
    from mpeg_pcc_tmc13_tpu.models import geometry_octree as go

    depth = 10
    pos = make_surface_cloud(60000, depth)
    uniq = _uniq_codes(pos)
    pos_u = morton.decode(uniq)

    payload = geometry_rans.encode(pos_u, depth)
    enc = entropy.RangeEncoder()
    go.encode(pos_u, depth, enc, go.OctreeContexts(), engine="auto",
              ctx_mode=octree_ops.CTX_MODE_PARENT, need_order=False)
    host_len = len(enc.get_bytes())
    assert len(payload) < 1.25 * host_len, \
        f"rans {len(payload)} B vs host {host_len} B"


def test_cli_rans_engine(tmp_path):
    rng = np.random.default_rng(5)
    pos = rng.integers(0, 512, (3000, 3)).astype(np.float64)
    in_ply = tmp_path / "in.ply"
    ply.write(ply.PlyCloud(positions=pos), str(in_ply),
              position_is_float=False)
    out_bin = tmp_path / "out.bin"
    rec_ply = tmp_path / "rec.ply"
    from mpeg_pcc_tmc13_tpu.runtime import cli
    assert cli.main([
        "--mode=0", "--geomEngine=rans",
        "--positionQuantizationScale=1", "--mergeDuplicatedPoints=1",
        f"--uncompressedDataPath={in_ply}",
        f"--compressedStreamPath={out_bin}"]) == 0
    assert cli.main([
        "--mode=1", f"--compressedStreamPath={out_bin}",
        f"--reconstructedDataPath={rec_ply}"]) == 0
    rec = ply.read(str(rec_ply))
    src = pos.astype(np.int64)
    np.testing.assert_array_equal(
        _uniq_codes(src),
        np.sort(morton.encode(rec.positions.astype(np.int64))))
