import numpy as np
import jax.numpy as jnp

from mpeg_pcc_tmc13_tpu.utils import morton


def test_roundtrip_numpy():
    rng = np.random.default_rng(0)
    pos = rng.integers(0, 1 << 21, size=(10000, 3)).astype(np.int64)
    codes = morton.encode(pos)
    back = morton.decode(codes)
    assert np.array_equal(pos, back)


def test_roundtrip_jax():
    rng = np.random.default_rng(1)
    pos = rng.integers(0, 1 << 21, size=(1000, 3)).astype(np.int64)
    codes = morton.encode_jax(jnp.asarray(pos))
    back = np.asarray(morton.decode_jax(codes))
    assert np.array_equal(pos, back)
    # numpy and jax agree bit-for-bit
    assert np.array_equal(np.asarray(codes), morton.encode(pos))


def test_child_index_convention():
    # child index must be (x<<2)|(y<<1)|z (reference geometry_octree.h:88)
    pos = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
    codes = morton.encode(pos)
    assert list(codes) == [4, 2, 1, 7]


def test_morton_order_is_sorted_by_tree_traversal():
    rng = np.random.default_rng(2)
    pos = rng.integers(0, 256, size=(5000, 3)).astype(np.int64)
    codes = np.sort(morton.encode(pos))
    # parent codes are nondecreasing too (prefix property)
    parents = codes >> 3
    assert np.all(np.diff(parents) >= 0)
