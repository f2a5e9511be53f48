"""Slice/tile partitioning tests."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.ops import partition as pt


def cloud(n=5000, depth=10, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)


def check_cover(slices, n):
    """Slices form a partition of range(n)."""
    all_idx = np.sort(np.concatenate(slices)) if slices else np.array([])
    np.testing.assert_array_equal(all_idx, np.arange(n))


@pytest.mark.parametrize("method", list(pt.PartitionMethod))
def test_methods_cover_all_points(method):
    pos = cloud()
    slices = pt.partition_slices(pos, method, max_points=1000,
                                 octree_depth=2)
    check_cover(slices, len(pos))
    assert all(len(s) <= 1000 for s in slices)


def test_uniform_geom_splits_along_longest_edge():
    pos = cloud()
    pos[:, 0] *= 4  # make x the long axis
    slices = pt.partition_uniform_geom(pos, 4)
    assert 2 <= len(slices) <= 8
    # slices are disjoint ranges in x
    ranges = sorted((pos[s][:, 0].min(), pos[s][:, 0].max())
                    for s in slices)
    for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
        assert b1 < a2


def test_min_points_merging():
    pos = cloud(n=1000)
    slices = pt.partition_slices(
        pos, pt.PartitionMethod.OCTREE_UNIFORM, max_points=10_000,
        min_points=200, octree_depth=2)
    check_cover(slices, len(pos))
    # merged slices respect the floor (except possibly the last)
    assert all(len(s) >= 200 for s in slices[:-1])


def test_tile_partition_inventory():
    pos = cloud(n=2000, depth=8)
    groups, inv = pt.tile_partition(pos, 64)
    check_cover(groups, len(pos))
    assert len(groups) == len(inv)
    for g, (origin, size) in zip(groups, inv):
        o = np.asarray(origin)
        assert np.all(pos[g] >= o) and np.all(pos[g] < o + 64)


def test_pipeline_with_uniform_square_and_tiles():
    import io
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import (PayloadType, iter_tlv,
                                                  write_tlv)
    from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
    from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
    from mpeg_pcc_tmc13_tpu.runtime.encoder import (EncoderParams,
                                                    FrameEncoder)
    from mpeg_pcc_tmc13_tpu.utils import morton
    pos = cloud(n=4000, depth=9, seed=3)
    params = EncoderParams(
        partition_method=pt.PartitionMethod.UNIFORM_SQUARE,
        max_points_per_slice=800, tile_size=256)
    bs = io.BytesIO()
    FrameEncoder(params).compress(PointCloud(pos),
                                  lambda b: write_tlv(b, bs))
    bs.seek(0)
    bufs = list(iter_tlv(bs))
    assert any(b.type == PayloadType.TILE_INVENTORY for b in bufs)
    assert sum(b.type == PayloadType.GEOMETRY_BRICK for b in bufs) > 1
    outs = []
    dec = FrameDecoder(outs.append)
    for b in bufs:
        dec.decompress(b)
    dec.flush()
    np.testing.assert_array_equal(
        np.sort(morton.encode(outs[0].positions)),
        np.unique(morton.encode(pos)))
