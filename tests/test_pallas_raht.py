"""Pallas RAHT block-butterfly kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mpeg_pcc_tmc13_tpu.ops import pallas_raht


def numpy_reference(vals, w):
    """Direct numpy mirror of the staged butterfly."""
    vals = vals.copy().astype(np.float64)
    w = w.copy().astype(np.float64)
    b = vals.shape[0]
    for stride in (1, 2, 4):
        for blk in range(b):
            for j in range(8):
                if j % (2 * stride) >= stride:
                    continue
                k = j + stride
                if w[blk, j] > 0 and w[blk, k] > 0:
                    w1, w2 = w[blk, j], w[blk, k]
                    rs = np.sqrt(w1 + w2)
                    a, bb = np.sqrt(w1) / rs, np.sqrt(w2) / rs
                    v1 = vals[blk, j].copy()
                    v2 = vals[blk, k].copy()
                    vals[blk, j] = a * v1 + bb * v2
                    vals[blk, k] = -bb * v1 + a * v2
                    w[blk, j] = w1 + w2
                    w[blk, k] = 0.0
    return vals, w


def make_blocks(b, c, seed=0, sparsity=0.5):
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 50, (b, 8, c)).astype(np.float32)
    w = rng.integers(0, 5, (b, 8)).astype(np.float32)
    w[rng.random((b, 8)) < sparsity] = 0.0
    vals[w == 0] = 0.0
    # ensure every block has at least one occupied slot
    w[:, 0] = np.maximum(w[:, 0], 1.0)
    return vals, w


def test_kernel_matches_numpy():
    vals, w = make_blocks(64, 3, seed=1)
    out_v, out_w = pallas_raht.fwd_blocks(
        jnp.asarray(vals), jnp.asarray(w), interpret=True)
    ref_v, ref_w = numpy_reference(vals, w)
    np.testing.assert_allclose(np.asarray(out_v), ref_v, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_w), ref_w, atol=1e-5)


def test_kernel_preserves_energy():
    vals, w = make_blocks(32, 1, seed=2, sparsity=0.3)
    out_v, _ = pallas_raht.fwd_blocks(
        jnp.asarray(vals), jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(
        np.sum(np.asarray(out_v) ** 2), np.sum(vals ** 2), rtol=1e-4)


def test_kernel_dc_is_weighted_block_dc():
    # single fully-occupied block with unit weights: DC = sqrt(8)*mean
    vals = np.arange(8, dtype=np.float32).reshape(1, 8, 1)
    w = np.ones((1, 8), dtype=np.float32)
    out_v, out_w = pallas_raht.fwd_blocks(
        jnp.asarray(vals), jnp.asarray(w), interpret=True)
    assert float(out_w[0, 0]) == 8.0
    np.testing.assert_allclose(
        float(out_v[0, 0, 0]), np.sqrt(8) * vals.mean(), rtol=1e-5)


def test_kernel_padding_past_tile():
    vals, w = make_blocks(300, 3, seed=3)  # > BLOCK_TILE, not multiple
    out_v, out_w = pallas_raht.fwd_blocks(
        jnp.asarray(vals), jnp.asarray(w), interpret=True)
    assert out_v.shape == (300, 8, 3)
    ref_v, _ = numpy_reference(vals, w)
    np.testing.assert_allclose(np.asarray(out_v), ref_v, atol=1e-3)
