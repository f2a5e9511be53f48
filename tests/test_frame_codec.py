"""End-to-end frame encoder -> TLV -> decoder round-trip."""

import io

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import hls
from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
from mpeg_pcc_tmc13_tpu.models.pointcloud import PointCloud
from mpeg_pcc_tmc13_tpu.runtime.decoder import FrameDecoder
from mpeg_pcc_tmc13_tpu.runtime.encoder import (AttributeConfig,
                                                EncoderParams, FrameEncoder)
from mpeg_pcc_tmc13_tpu.utils import morton


def make_cloud(n=2000, depth=9, seed=0, colors=True, refl=False,
               negative=False):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1 << depth, size=(n, 3), dtype=np.int64)
    if negative:
        pos -= 1 << (depth - 1)
    return PointCloud(
        positions=pos,
        colors=rng.integers(0, 256, (n, 3), dtype=np.uint16)
        if colors else None,
        reflectances=rng.integers(0, 256, n, dtype=np.uint16)
        if refl else None,
    )


def roundtrip(cloud_or_clouds, params):
    clouds = (cloud_or_clouds if isinstance(cloud_or_clouds, list)
              else [cloud_or_clouds])
    bs = io.BytesIO()
    enc = FrameEncoder(params)
    for c in clouds:
        enc.compress(c, lambda buf: write_tlv(buf, bs))
    bs.seek(0)
    outputs = []
    dec = FrameDecoder(outputs.append)
    for buf in iter_tlv(bs):
        dec.decompress(buf)
    dec.flush()
    return outputs, bs.getbuffer().nbytes


def canon(cloud):
    """Sort cloud by Morton code for order-independent comparison."""
    order = np.argsort(morton.encode(cloud.positions), kind="stable")
    return cloud.take(order)


def test_geometry_only_lossless():
    cloud = make_cloud(colors=False)
    outs, nbytes = roundtrip(cloud, EncoderParams())
    assert len(outs) == 1
    expect = np.unique(morton.encode(cloud.positions))
    got = np.sort(morton.encode(outs[0].positions))
    np.testing.assert_array_equal(got, expect)
    assert nbytes < cloud.count * 12  # actually compressed


def test_geometry_negative_coords():
    cloud = make_cloud(colors=False, negative=True)
    outs, _ = roundtrip(cloud, EncoderParams())
    expect = np.unique(morton.encode(cloud.positions + (1 << 20)))
    got = np.sort(morton.encode(outs[0].positions + (1 << 20)))
    np.testing.assert_array_equal(got, expect)


def test_raw_attributes_lossless():
    cloud = make_cloud(colors=True, refl=True)
    params = EncoderParams(attributes=[
        AttributeConfig("color", 8, hls.AttributeEncoding.RAW),
        AttributeConfig("reflectance", 8, hls.AttributeEncoding.RAW),
    ])
    outs, _ = roundtrip(cloud, params)
    got = canon(outs[0])
    # dedup the source identically to compare attributes
    from mpeg_pcc_tmc13_tpu.ops.processing import dedup_with_attributes
    expect = canon(dedup_with_attributes(cloud))
    np.testing.assert_array_equal(got.positions, expect.positions)
    np.testing.assert_array_equal(got.colors, expect.colors)
    np.testing.assert_array_equal(got.reflectances, expect.reflectances)


def test_lossy_geometry_scale():
    cloud = make_cloud(colors=False, depth=12)
    params = EncoderParams(geom_scale_num=1, geom_scale_den=4)
    outs, _ = roundtrip(cloud, params)
    # every reconstructed point within den/2 of some source point (grid)
    err = np.abs(outs[0].positions[:, None, :] -
                 cloud.positions[None, :2000:50, :])
    assert outs[0].count > 0
    # positions are on the de-quantised lattice
    assert np.all(outs[0].positions % 1 == 0)


def test_multi_frame():
    clouds = [make_cloud(seed=s, colors=False) for s in range(3)]
    outs, _ = roundtrip(clouds, EncoderParams())
    assert len(outs) == 3
    for src, out in zip(clouds, outs):
        expect = np.unique(morton.encode(src.positions))
        np.testing.assert_array_equal(
            np.sort(morton.encode(out.positions)), expect)


def test_multi_slice():
    cloud = make_cloud(n=5000, colors=False)
    params = EncoderParams(max_points_per_slice=1000)
    outs, _ = roundtrip(cloud, params)
    expect = np.unique(morton.encode(cloud.positions))
    got = np.sort(morton.encode(outs[0].positions))
    np.testing.assert_array_equal(got, expect)


def test_duplicate_points_kept():
    cloud = make_cloud(n=1000, colors=False)
    dup = PointCloud(np.concatenate([cloud.positions, cloud.positions[:100]]))
    params = EncoderParams(merge_duplicated_points=False)
    outs, _ = roundtrip(dup, params)
    assert outs[0].count == dup.count
    np.testing.assert_array_equal(
        np.sort(morton.encode(outs[0].positions)),
        np.sort(morton.encode(dup.positions)))


def test_in_tree_geometry_quantisation():
    cloud = make_cloud(n=4000, depth=11, colors=True)
    params = EncoderParams(
        geom_qp_shift=2,
        attributes=[AttributeConfig("color", 8,
                                    hls.AttributeEncoding.RAHT, qp=16)])
    outs, nbytes_q = roundtrip(cloud, params)
    out = outs[0]
    assert out.count > 0
    # reconstructed points sit at coarse-grid voxel centres
    assert np.all((out.positions - 2) % 4 == 0)
    # every recon point within the quantisation cell of some source pt
    # (check a sample)
    src = cloud.positions
    sample = out.positions[:: max(1, out.count // 200)]
    d = np.abs(sample[:, None, :] - src[None, :, :]).max(axis=2).min(axis=1)
    assert d.max() <= 2
    # smaller than unquantised
    _, nbytes_full = roundtrip(cloud, EncoderParams(attributes=[
        AttributeConfig("color", 8, hls.AttributeEncoding.RAHT, qp=16)]))
    assert nbytes_q < nbytes_full
    assert out.colors is not None and out.colors.shape[0] == out.count


def test_attr_param_inventory_updates_scale_and_defaults():
    """AttributeParamInventory (reference hls.h:303): mid-sequence
    scale/offset updates apply from the signalled frame on, and soft
    default values replace the mid-range fill for lost bricks."""
    import io

    from mpeg_pcc_tmc13_tpu.bitstream.tlv import (PayloadType, iter_tlv,
                                                  write_tlv)
    rng = np.random.default_rng(40)
    pos = rng.integers(0, 128, (800, 3), dtype=np.int64)
    refl = np.full(800, 7, dtype=np.uint16)
    params = EncoderParams(attributes=[AttributeConfig(
        "reflectance", 16, hls.AttributeEncoding.PRED, qp=4)])
    enc = FrameEncoder(params)
    bs = io.BytesIO()
    enc.compress(PointCloud(pos, reflectances=refl),
                 lambda b: write_tlv(b, bs))
    # frame 2: values now stored at half scale -> scale 2 inventory
    enc.update_attribute_params(0, attr_scale=2, attr_offset=1,
                                default_value=(99,))
    enc.compress(PointCloud(pos, reflectances=refl),
                 lambda b: write_tlv(b, bs))
    bs.seek(0)
    outs = []
    dec = FrameDecoder(outs.append)
    kinds = []
    for b in iter_tlv(bs):
        kinds.append(b.type)
        dec.decompress(b)
    dec.flush()
    assert PayloadType.ATTR_PARAM_INVENTORY in kinds
    assert len(outs) == 2
    # both frames round-trip (encoder divides by scale, decoder
    # multiplies back); the decoder's active description now
    # carries the updated interpretation
    assert int(np.unique(outs[0].reflectances)[0]) == 7
    assert int(np.unique(outs[1].reflectances)[0]) == 7
    assert dec.active_sps.attributes[0].attr_scale == 2
    assert dec.active_sps.attributes[0].attr_offset == 1
    # soft default is tracked for loss resilience
    assert dec._attr_defaults[0] == (99,)


def test_geom_qp_regions():
    """Per-region geometry quantisation (per-node QP at region
    granularity): box points code on a coarser grid (bounded error,
    fewer unique points), outside stays lossless."""
    import io

    from mpeg_pcc_tmc13_tpu.bitstream.tlv import iter_tlv, write_tlv
    rng = np.random.default_rng(70)
    pos = rng.integers(0, 512, (20000, 3), dtype=np.int64)
    box = ((0, 0, 0), (256, 512, 512), 3)
    sizes = {}
    for regions in ([], [box]):
        params = EncoderParams(geom_qp_regions=list(regions))
        enc = FrameEncoder(params)
        bs = io.BytesIO()
        enc.compress(PointCloud(pos), lambda b: write_tlv(b, bs))
        bs.seek(0)
        outs = []
        dec = FrameDecoder(outs.append)
        for b in iter_tlv(bs):
            dec.decompress(b)
        dec.flush()
        out = outs[0].positions.astype(np.int64)
        sizes[bool(regions)] = bs.getbuffer().nbytes
        inb = pos[:, 0] < 256
        outb_src = np.unique(morton.encode(pos[~inb]))
        outb_dec = np.unique(morton.encode(out[out[:, 0] >= 256]))
        np.testing.assert_array_equal(outb_dec, outb_src)  # lossless
        if regions:
            # box points land on cell centres within half a cell
            got_in = out[out[:, 0] < 256]
            assert got_in.shape[0] < inb.sum()      # merged
            d = np.abs(got_in[:, None, :2] - pos[inb][None, ::17, :2])
            assert ((got_in[:, 0] - 4) % 8 == 0).all()
    assert sizes[True] < sizes[False] * 0.9


def test_obuf_engine_roundtrip_and_rd():
    """The OBUF brick engine must round-trip exactly and beat the
    default occupancy coder on dense surfaces."""
    rng = np.random.default_rng(11)
    side = 160
    xs = rng.integers(0, 512, side * side)
    ys = rng.integers(0, 512, side * side)
    zs = ((np.sin(xs / 60.0) + np.cos(ys / 47.0) + 2) * 100).astype(
        np.int64)
    pos = np.unique(np.stack([xs, ys, zs], axis=1), axis=0)
    cloud = PointCloud(pos)

    outs, total_obuf = roundtrip(
        cloud, EncoderParams(engine="obuf", planar_enabled=True))
    assert np.array_equal(
        np.unique(outs[0].positions, axis=0), pos)

    _, total_auto = roundtrip(cloud, EncoderParams())
    assert total_obuf < total_auto


def test_obuf_engine_with_attributes():
    rng = np.random.default_rng(12)
    pos = np.unique(rng.integers(0, 256, (5000, 3)), axis=0)
    colors = (pos * [1, 2, 3] % 256).astype(np.int64)
    cloud = PointCloud(pos, colors=colors)
    params = EncoderParams(
        engine="obuf", planar_enabled=True,
        attributes=[AttributeConfig(label="color", qp=4,
                                    raht_integer_haar=True)])
    outs, _ = roundtrip(cloud, params)
    got = canon(outs[0])
    want = canon(cloud)
    assert np.array_equal(got.positions, want.positions)
    assert np.array_equal(got.colors, want.colors)


def test_parallel_slices_byte_identical():
    """Slice-parallel encode (host thread pool; framework extension
    --parallelSlices) must emit a byte-identical stream to the
    sequential encode — fresh contexts per slice make bricks
    independent, the reference's own parallelism surface
    (partitioning.cpp:120-497)."""
    import io
    from mpeg_pcc_tmc13_tpu.bitstream.tlv import write_tlv
    rng = np.random.default_rng(33)
    pos = np.unique(rng.integers(0, 1024, (60000, 3)).astype(np.int64),
                    axis=0)
    colors = (pos * [3, 5, 7] % 256).astype(np.int64)
    cloud = PointCloud(pos, colors=colors)

    def run(par):
        bs = io.BytesIO()
        enc = FrameEncoder(EncoderParams(
            engine="obuf", planar_enabled=True,
            max_points_per_slice=15000, parallel_slices=par,
            attributes=[AttributeConfig(label="color", qp=22)]))
        enc.compress(cloud, lambda b: write_tlv(b, bs))
        return bs.getvalue()

    assert run(4) == run(0)
