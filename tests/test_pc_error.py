"""Analytic validation of the pc_error-equivalent metric tool.

The reference CTC pipeline relies on the external mpeg-pcc-dmetric
tool (Makefile.tmc13-step:37); that binary is not available here, so
these tests pin tools/pc_error.py to cases with closed-form answers:
exact-NN matching, the symmetric max, the 3*r^2 peak energy, and
source-normal p2plane projection.
"""

import importlib.util
import os
import sys

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "pc_error", os.path.join(_root, "tools", "pc_error.py"))
pc_error = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pc_error)

from mpeg_pcc_tmc13_tpu.utils import ply  # noqa: E402


def grid_cloud(spacing=4, n=8, colors=False):
    ax = np.arange(n) * spacing
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float64)
    c = None
    if colors:
        c = np.tile(np.array([[100, 150, 200]]), (g.shape[0], 1))
    return ply.PlyCloud(positions=g, colors=c)


def test_identical_clouds_infinite_psnr():
    a = grid_cloud()
    r = pc_error.compute(a, a, resolution=100.0)
    assert r["d1_mse"] == 0.0
    assert np.isinf(r["d1_psnr"])


def test_known_shift_exact_d1():
    """Shift < half the grid spacing: every NN is the counterpart, so
    d1 mse == shift^2 and psnr == 10*log10(3*r^2 / mse)."""
    a = grid_cloud(spacing=4)
    b = ply.PlyCloud(positions=a.positions + np.array([1.0, 0, 0]))
    r = pc_error.compute(a, b, resolution=100.0, with_d2=False)
    assert abs(r["d1_mse"] - 1.0) < 1e-12
    expect = 10.0 * np.log10(3.0 * 100.0 * 100.0 / 1.0)
    assert abs(r["d1_psnr"] - expect) < 1e-9


def test_d2_separates_in_plane_from_normal_error():
    """On a flat plane, a normal-direction shift keeps d2 == d1 while
    an in-plane shift drives d2 to ~0 (the point of p2plane)."""
    ax = np.arange(32) * 2.0
    g = np.stack(np.meshgrid(ax, ax, indexing="ij"),
                 axis=-1).reshape(-1, 2)
    plane = np.concatenate([g, np.zeros((g.shape[0], 1))], axis=1)
    a = ply.PlyCloud(positions=plane)
    up = ply.PlyCloud(positions=plane + np.array([0, 0, 0.5]))
    r_up = pc_error.compute(a, up, resolution=10.0)
    assert abs(r_up["d2_mse"] - 0.25) < 0.02
    within = ply.PlyCloud(positions=plane + np.array([0.5, 0, 0]))
    r_in = pc_error.compute(a, within, resolution=10.0)
    assert r_in["d2_mse"] < 0.02
    assert abs(r_in["d1_mse"] - 0.25) < 1e-9


def test_symmetric_max_direction():
    """An extra far outlier in B only hurts the B->A direction; the
    symmetric metric must take the max of the two."""
    a = grid_cloud(spacing=4)
    bpos = np.concatenate([a.positions, [[1000.0, 1000.0, 1000.0]]])
    b = ply.PlyCloud(positions=bpos)
    r = pc_error.compute(a, b, resolution=100.0, with_d2=False)
    assert r["d1_mse"] > 100.0


def test_color_channel_psnr():
    a = grid_cloud(colors=True)
    cb = a.colors.copy()
    cb[:, 0] += 10            # +10 in R
    b = ply.PlyCloud(positions=a.positions.copy(), colors=cb)
    r = pc_error.compute(a, b, resolution=100.0, with_d2=False)
    # Y error = 0.2126*10, peak 255
    ey = 0.2126 * 10
    expect = 10.0 * np.log10(255.0 ** 2 / (ey * ey))
    assert abs(r["y_psnr"] - expect) < 1e-6
