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
