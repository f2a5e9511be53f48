"""Recolouring: native transfer core vs the numpy spec.

The native recolour_core (native/recolour.cc) must be bit-equal to the
numpy stages in ops/recolour.py (same IEEE-double ops, including
numpy's pairwise summation order for the forward weight row), since
the transferred attributes feed losslessly-coded streams.
Counterpart of the reference recolour (pointset_processing.cpp:253+).
"""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
from mpeg_pcc_tmc13_tpu.ops import recolour as R

pytestmark = pytest.mark.skipif(
    entropy._LIB is None, reason="native library not built")


def _clouds(seed, ns, lo=0, hi=400):
    rng = np.random.default_rng(seed)
    pos = rng.integers(lo, hi, (ns, 3)).astype(np.int64)
    cols = rng.integers(0, 256, (ns, 3)).astype(np.uint16)
    refl = rng.integers(0, 60000, (ns,)).astype(np.uint16)
    return PointCloud(pos, cols, refl)


@pytest.mark.parametrize("scale", [(1, 1), (1, 2), (1, 4), (2, 3)])
def test_native_transfer_bit_equal(scale):
    src = _clouds(scale[1] * 7 + scale[0], 40000)
    tgt = np.unique(
        (src.positions * scale[0] + scale[1] // 2) // scale[1], axis=0)
    out_nat = R.recolour(src, tgt, scale[0], scale[1])
    R._NATIVE_TRANSFER = False
    try:
        out_py = R.recolour(src, tgt, scale[0], scale[1])
    finally:
        R._NATIVE_TRANSFER = True
    assert np.array_equal(out_nat.colors, out_py.colors)
    assert np.array_equal(out_nat.reflectances, out_py.reflectances)


def test_native_transfer_search_range_and_flags():
    src = _clouds(11, 20000)
    tgt = np.unique((src.positions + 1) // 3, axis=0)
    params = R.RecolourParams(search_range=2,
                              use_dist_weighted_avg_bwd=False,
                              skip_avg_if_identical_fwd=False,
                              num_neighbours_bwd=2)
    out_nat = R.recolour(src, tgt, 1, 3, params=params)
    R._NATIVE_TRANSFER = False
    try:
        out_py = R.recolour(src, tgt, 1, 3, params=params)
    finally:
        R._NATIVE_TRANSFER = True
    assert np.array_equal(out_nat.colors, out_py.colors)
    assert np.array_equal(out_nat.reflectances, out_py.reflectances)


def test_active_attribute_cap_falls_back():
    """Finite attribute caps are outside the native core's scope; the
    numpy path must serve them (returns, not crashes)."""
    src = _clouds(5, 3000)
    tgt = np.unique((src.positions + 1) // 2, axis=0)
    params = R.RecolourParams(max_attribute_dist2_fwd=100.0)
    out = R.recolour(src, tgt, 1, 2, params=params)
    assert out.colors.shape[0] == tgt.shape[0]
