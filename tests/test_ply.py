import numpy as np

from mpeg_pcc_tmc13_tpu.utils import ply


def _make_cloud(n=1000, colors=True, refl=False):
    rng = np.random.default_rng(0)
    c = ply.PlyCloud(positions=rng.integers(0, 1024, (n, 3)).astype(np.float64))
    if colors:
        c.colors = rng.integers(0, 256, (n, 3)).astype(np.uint16)
    if refl:
        c.reflectances = rng.integers(0, 65536, n).astype(np.uint16)
    return c


def test_binary_roundtrip(tmp_path):
    c = _make_cloud(refl=True)
    p = tmp_path / "a.ply"
    ply.write(c, p)
    r = ply.read(p)
    assert np.array_equal(r.positions, c.positions)
    assert np.array_equal(r.colors, c.colors)
    assert np.array_equal(r.reflectances, c.reflectances)


def test_ascii_roundtrip(tmp_path):
    c = _make_cloud(n=137)
    p = tmp_path / "a.ply"
    ply.write(c, p, ascii=True)
    r = ply.read(p)
    assert np.array_equal(r.positions, c.positions)
    assert np.array_equal(r.colors, c.colors)


def test_color_disk_order_is_gbr(tmp_path):
    # reference writes green,blue,red property order (ply.cpp:127-129)
    c = _make_cloud(n=4)
    p = tmp_path / "a.ply"
    ply.write(c, p)
    header = open(p, "rb").read(400).decode("ascii", "replace")
    g = header.index("property uchar green")
    b = header.index("property uchar blue")
    r = header.index("property uchar red")
    assert g < b < r


def test_expand_num():
    assert ply.expand_num("frame%04d.ply", 7) == "frame0007.ply"
    assert ply.expand_num("f%d.ply", 12) == "f12.ply"
    assert ply.expand_num("noformat.ply", 3) == "noformat.ply"


def test_pc_error_tool(tmp_path):
    """tools/pc_error.py: D1/D2 PSNR between source and recon
    (pc_error counterpart); identity compare is infinite, a 1-voxel
    shift is finite and D2 <= D1 on planar content."""
    import subprocess
    import sys

    import numpy as np

    from mpeg_pcc_tmc13_tpu.utils import ply as _ply
    rng = np.random.default_rng(60)
    n = 2000
    xy = rng.integers(0, 256, (n, 2))
    pos = np.column_stack([xy, np.full(n, 64)]).astype(np.float64)
    a = tmp_path / "a.ply"
    b = tmp_path / "b.ply"
    _ply.write(_ply.PlyCloud(positions=pos), str(a),
               position_is_float=False)
    _ply.write(_ply.PlyCloud(positions=pos + np.array([0, 0, 1.0])),
               str(b), position_is_float=False)
    r = subprocess.run(
        [sys.executable, "tools/pc_error.py", "--fileA", str(a),
         "--fileB", str(b), "--resolution", "255"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = dict(ln.rsplit(":", 1) for ln in
                 r.stdout.strip().splitlines())
    d1 = float(lines["mseF,PSNR (p2point)"])
    # mse=1, peak energy 3*255^2 (dmetric convention) -> 52.90 dB
    assert 52.0 < d1 < 54.0
    # identity -> inf
    r2 = subprocess.run(
        [sys.executable, "tools/pc_error.py", "--fileA", str(a),
         "--fileB", str(a), "--resolution", "255"],
        capture_output=True, text=True)
    assert "inf" in r2.stdout
