"""Pallas RAHT block-butterfly kernel + device forward tests.

Run in interpret mode (CPU).  Equivalence target: the numpy dyadic
sweeps in ops/raht.py — same butterflies, same weights; only the
serialisation order differs (block-major vs sweep-row-major), so
coefficients are compared as sorted multisets per octree level.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mpeg_pcc_tmc13_tpu.ops import pallas_raht, raht_device
from mpeg_pcc_tmc13_tpu.ops import raht as raht_np
from mpeg_pcc_tmc13_tpu.utils import morton


def make_cloud(n, depth, c=3, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    codes = np.unique(morton.encode(pos))
    vals = rng.normal(0, 50, (codes.size, c))
    return codes, vals


def numpy_level_acs(codes, vals, depth):
    """Per octree level: sorted multiset of sweep AC values."""
    sweeps = raht_np.merge_structure(codes, depth)
    v = vals.astype(np.float64)
    acs = [[] for _ in range(depth)]
    for s, sw in enumerate(sweeps):
        first, second, keep = sw["first"], sw["second"], sw["keep"]
        w1 = sw["w"][first].astype(np.float64)[:, None]
        w2 = sw["w"][second].astype(np.float64)[:, None]
        rs = np.sqrt(w1 + w2)
        a, b = np.sqrt(w1) / rs, np.sqrt(w2) / rs
        dc = a * v[first] + b * v[second]
        ac = -b * v[first] + a * v[second]
        acs[s // 3].append(ac)
        nv = v.copy()
        nv[first] = dc
        v = nv[keep]
    return [np.sort(np.concatenate(a, axis=0).ravel())
            if a and sum(x.shape[0] for x in a) else np.zeros(0)
            for a in acs], v


@pytest.mark.parametrize("n,depth", [(40, 2), (500, 3), (2000, 4)])
def test_device_forward_matches_numpy_sweeps(n, depth):
    codes, vals = make_cloud(n, depth, seed=n)
    acs_dev, root_dev = raht_device.forward_device(
        codes, vals, depth, interpret=True)
    acs_ref, root_ref = numpy_level_acs(codes, vals, depth)
    np.testing.assert_allclose(np.asarray(root_dev), root_ref,
                               atol=1e-2)
    for l in range(depth):
        coeffs, mask = acs_dev[l]
        got = np.sort(np.asarray(coeffs)[np.asarray(mask) > 0].ravel())
        np.testing.assert_allclose(got, acs_ref[l], atol=1e-2)


def test_device_forward_preserves_energy():
    codes, vals = make_cloud(800, 3, c=1, seed=9)
    acs_dev, root = raht_device.forward_device(
        codes, vals, 3, interpret=True)
    total = float(np.sum(np.asarray(root) ** 2))
    for coeffs, mask in acs_dev:
        sel = np.asarray(mask) > 0
        total += float(np.sum(np.asarray(coeffs)[sel] ** 2))
    np.testing.assert_allclose(total, np.sum(vals ** 2), rtol=1e-4)


def test_kernel_single_full_block():
    vals = np.arange(8, dtype=np.float32).reshape(1, 8, 1)
    w = np.ones((1, 8), dtype=np.float32)
    coeffs, wout, mask = pallas_raht.fwd_blocks(
        jnp.asarray(vals), jnp.asarray(w), interpret=True)
    assert float(wout[0, 0]) == 8.0
    assert int(np.asarray(mask).sum()) == 7   # 7 ACs for 8 children
    np.testing.assert_allclose(
        float(coeffs[0, 0, 0]), np.sqrt(8) * vals.mean(), rtol=1e-5)


def test_kernel_sparse_collapse():
    # slots {1, 2} only: must merge at stage 2 via positional collapse
    vals = np.zeros((1, 8, 1), dtype=np.float32)
    w = np.zeros((1, 8), dtype=np.float32)
    vals[0, 1, 0] = 10.0
    vals[0, 2, 0] = 20.0
    w[0, 1] = w[0, 2] = 1.0
    coeffs, wout, mask = pallas_raht.fwd_blocks(
        jnp.asarray(vals), jnp.asarray(w), interpret=True)
    assert float(wout[0, 0]) == 2.0
    assert int(np.asarray(mask).sum()) == 1
    np.testing.assert_allclose(float(coeffs[0, 0, 0]),
                               30.0 / np.sqrt(2), rtol=1e-5)


def test_kernel_padding_past_tile():
    codes, vals = make_cloud(3000, 4, seed=3)
    acs_dev, root = raht_device.forward_device(
        codes, vals, 4, interpret=True)
    assert np.asarray(root).shape[0] == 1


def test_inverse_device_roundtrip():
    """Device inverse RAHT (inv_blocks + top-down driver) reconstructs
    forward_device's input exactly (float32)."""
    rng = np.random.default_rng(3)
    pos = np.unique(rng.integers(0, 16, (400, 3)).astype(np.int64),
                    axis=0)
    codes = np.sort(morton.encode(pos))
    vals = rng.normal(100, 30, (codes.size, 3)).astype(np.float32)
    depth = 4
    acs, root = raht_device.forward_device(codes, vals, depth,
                                           interpret=True)
    rec = raht_device.inverse_device(codes, acs, root, depth,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(rec), vals, atol=2e-3)
