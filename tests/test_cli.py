"""CLI / sequence-driver end-to-end tests (tmc3-compatible surface)."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.runtime import cli
from mpeg_pcc_tmc13_tpu.utils import morton, ply


@pytest.fixture
def sample_ply(tmp_path):
    rng = np.random.default_rng(5)
    n = 3000
    pos = rng.integers(0, 512, (n, 3)).astype(np.float64)
    colors = rng.integers(0, 256, (n, 3)).astype(np.uint16)
    path = tmp_path / "in.ply"
    ply.write(ply.PlyCloud(positions=pos, colors=colors), str(path),
              position_is_float=False)
    return path, pos, colors


def test_encode_decode_cli(tmp_path, sample_ply):
    in_ply, pos, colors = sample_ply
    cfg = tmp_path / "enc.cfg"
    cfg.write_text(
        "mode: 0\n"
        "positionQuantizationScale: 1\n"
        "mergeDuplicatedPoints: 1\n"
        "transformType: 3\n"
        "bitdepth: 8\n"
        "attribute: color\n")
    out_bin = tmp_path / "out.bin"
    rec_ply = tmp_path / "rec.ply"
    assert cli.main(["-c", str(cfg),
                     f"--uncompressedDataPath={in_ply}",
                     f"--compressedStreamPath={out_bin}"]) == 0
    assert out_bin.stat().st_size > 0
    assert cli.main(["--mode=1",
                     f"--compressedStreamPath={out_bin}",
                     f"--reconstructedDataPath={rec_ply}"]) == 0

    rec = ply.read(str(rec_ply))
    src_codes = morton.encode(pos.astype(np.int64))
    ka = np.argsort(src_codes, kind="stable")
    keep = np.concatenate([[True], np.diff(src_codes[ka]) != 0])
    kb = np.argsort(morton.encode(rec.positions.astype(np.int64)))
    np.testing.assert_array_equal(
        pos.astype(np.int64)[ka][keep], rec.positions[kb].astype(np.int64))
    np.testing.assert_array_equal(colors[ka][keep], rec.colors[kb])


def test_unknown_options_ignored(tmp_path, sample_ply):
    in_ply, _, _ = sample_ply
    out_bin = tmp_path / "o.bin"
    # reference CTC cfg options we don't use yet must not fail
    assert cli.main([f"--uncompressedDataPath={in_ply}",
                     f"--compressedStreamPath={out_bin}",
                     "--mode=0", "--neighbourAvailBoundaryLog2=8",
                     "--intra_pred_max_node_size_log2=6",
                     "--maxNumQtBtBeforeOt=4",
                     "--planarEnabled=1"]) == 0


def test_lossy_scale_cli(tmp_path, sample_ply):
    in_ply, pos, _ = sample_ply
    out_bin = tmp_path / "o.bin"
    rec_ply = tmp_path / "r.ply"
    assert cli.main([f"--uncompressedDataPath={in_ply}",
                     f"--compressedStreamPath={out_bin}", "--mode=0",
                     "--positionQuantizationScale=0.25"]) == 0
    assert cli.main(["--mode=1", f"--compressedStreamPath={out_bin}",
                     f"--reconstructedDataPath={rec_ply}"]) == 0
    rec = ply.read(str(rec_ply))
    assert rec.count > 0
    # codec rounds half-up in integer: grid = (p + den//2) // den
    q = ((pos.astype(np.int64) + 2) // 4) * 4
    codes = set(map(tuple, q))
    got = set(map(tuple, rec.positions.astype(np.int64)))
    assert got == codes


def test_attribute_aps_knobs_flow_through(tmp_path, sample_ply):
    """Sticky reference option names land in the coded APS."""
    in_ply, _, _ = sample_ply
    out_bin = tmp_path / "k.bin"
    assert cli.main([
        "--mode=0", f"--uncompressedDataPath={in_ply}",
        f"--compressedStreamPath={out_bin}",
        "--transformType=1", "--qp=10",
        "--levelOfDetailCount=7",
        "--numberOfNearestNeighborsInPrediction=2",
        "--maxNumDirectPredictors=2",
        "--adaptivePredictionThreshold=32",
        "--rahtPredictionEnabled=0",
        "--attribute=color"]) == 0
    from mpeg_pcc_tmc13_tpu.bitstream import hls as _hls
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import PayloadType, iter_tlv
    with open(out_bin, "rb") as f:
        for buf in iter_tlv(f):
            if buf.type == PayloadType.ATTRIBUTE_PARAMETER_SET:
                a = _hls.AttributeParameterSet.parse(buf.data)
                assert a.init_qp == 10
                # reference semantics: levelOfDetailCount counts
                # REFINEMENT layers (TMC3.cpp:1374) -> 7 + base = 8
                assert a.lod_levels == 8
                assert a.num_pred_nearest_neighbours == 2
                assert a.max_direct_predictors == 2
                assert a.adaptive_prediction_threshold == 32
                assert a.raht_prediction_enabled is False
                break
        else:
            raise AssertionError("no APS in stream")
    # stream still decodes
    rec = tmp_path / "k.ply"
    assert cli.main(["--mode=1", f"--compressedStreamPath={out_bin}",
                     f"--reconstructedDataPath={rec}"]) == 0


def test_layer_qp_offsets_cli(tmp_path, sample_ply):
    """qpLayerOffsetsLuma/Chroma (reference TMC3.cpp:1447-1453) land in
    the ABH and reduce the attribute rate at matched settings."""
    in_ply, _, _ = sample_ply
    sizes = {}
    for tag, extra in (("flat", []),
                       ("layered", ["--qpLayerOffsetsLuma=0,6,12,18,24",
                                    "--qpLayerOffsetsChroma=0,6,12,18,24"])):
        out_bin = tmp_path / f"{tag}.bin"
        assert cli.main(
            ["--mode=0", f"--uncompressedDataPath={in_ply}",
             f"--compressedStreamPath={out_bin}", "--qp=16"]
            + extra + ["--attribute=color"]) == 0
        rec = tmp_path / f"{tag}.ply"
        assert cli.main(["--mode=1", f"--compressedStreamPath={out_bin}",
                         f"--reconstructedDataPath={rec}"]) == 0
        sizes[tag] = out_bin.stat().st_size
    assert sizes["layered"] < sizes["flat"]
    from mpeg_pcc_tmc13_tpu.bitstream import hls as _hls
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import PayloadType, iter_tlv
    with open(tmp_path / "layered.bin", "rb") as f:
        for buf in iter_tlv(f):
            if buf.type == PayloadType.ATTRIBUTE_BRICK:
                abh, _ = _hls.AttributeBrickHeader.parse(buf.data)
                assert abh.layer_qp_deltas_luma == [0, 6, 12, 18, 24]
                assert abh.layer_qp_deltas_chroma == [0, 6, 12, 18, 24]
                break
        else:
            raise AssertionError("no attribute brick")


def test_ctc_cfg_generator(tmp_path, sample_ply):
    """scripts/gen_ctc_cfg.py trees are directly consumable by the CLI
    (reference gen-cfg.sh + cfg/*.yaml equivalent)."""
    import json
    import subprocess
    import sys
    in_ply, _, _ = sample_ply
    seqs = tmp_path / "seqs.json"
    seqs.write_text(json.dumps([{
        "name": "t", "src": str(in_ply), "gp": 9,
        "attrs": ["color"], "frames": 1}]))
    out = tmp_path / "cfg"
    r = subprocess.run(
        [sys.executable, "scripts/gen_ctc_cfg.py", "--out", str(out),
         "--seq-json", str(seqs), "--geom", "octree",
         "--attr", "raht"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # C1 6 rates + C2 6 rates + CW 1 = 13 dirs
    cfgs = sorted(out.rglob("encoder.cfg"))
    assert len(cfgs) == 13
    # run the lossless point end-to-end
    d = out / "octree-raht-ctc-lossless-geom-lossless-attrs" / "t" / "r01"
    bs, rec = tmp_path / "o.bin", tmp_path / "r.ply"
    assert cli.main(["-c", str(d / "encoder.cfg"),
                     f"--compressedStreamPath={bs}"]) == 0
    assert cli.main(["-c", str(d / "decoder.cfg"),
                     f"--compressedStreamPath={bs}",
                     f"--reconstructedDataPath={rec}"]) == 0
    from mpeg_pcc_tmc13_tpu.utils import ply as _ply
    assert _ply.read(str(rec)).count > 0


def test_decode_autodetects_syntax_family(tmp_path, sample_ply):
    """mode=1 without --refSyntax must decode BOTH syntax families
    (reference decoder dispatch, decoder.cpp:302-418; the framework
    detects the family from the SPS payload)."""
    in_ply, pos, _ = sample_ply
    for flags, name in ((["--refSyntax=1", "--disableAttributeCoding=1"],
                         "ref"),
                        (["--disableAttributeCoding=1"], "native")):
        out_bin = tmp_path / f"{name}.bin"
        rec_ply = tmp_path / f"{name}_rec.ply"
        assert cli.main([f"--uncompressedDataPath={in_ply}",
                         f"--compressedStreamPath={out_bin}",
                         "--mode=0"] + flags) == 0
        # decode with NO syntax flag
        assert cli.main(["--mode=1",
                         f"--compressedStreamPath={out_bin}",
                         f"--reconstructedDataPath={rec_ply}"]) == 0
        rec = ply.read(str(rec_ply))
        uniq = np.unique(pos.astype(np.int64), axis=0)
        got = rec.positions.astype(np.int64)
        got = got[np.lexsort(got.T)]
        np.testing.assert_array_equal(uniq[np.lexsort(uniq.T)], got)


def test_detect_ref_syntax_on_garbage(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00\x00\x00\x00\x07" + b"\xff" * 7)
    assert cli.detect_ref_syntax(str(p)) in (True, False)  # no hang/crash
    p2 = tmp_path / "empty.bin"
    p2.write_bytes(b"")
    assert cli.detect_ref_syntax(str(p2)) is False
