"""Per-frame encoder orchestration.

Counterpart of `PCCTMC3Encoder3::compress` (reference encoder.cpp:86-610):
derive parameter sets on frame 0, quantise+dedup input, partition into
slices, per-slice geometry + attribute bricks, emit TLV payloads through
a callback.  Slices are the multi-chip parallelism unit (SURVEY.md §2.9);
the slice loop here is embarrassingly parallel and is what
`parallel/` shards over a device mesh.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from ..bitstream import entropy, hls
from ..bitstream.tlv import PayloadBuffer, PayloadType
from ..models import attributes as attr_model
from ..models import geometry_octree, geometry_predictive, geometry_trisoup
from ..models.pointcloud import PointCloud
from ..ops import motion as motion_ops
from ..ops import partition as partition_ops
from ..ops import processing


@dataclass
class AttributeConfig:
    """Per-attribute encoder options (reference per-attribute APS
    derivation, encoder.cpp:677-708)."""
    label: str = "color"
    bitdepth: int = 8
    encoding: hls.AttributeEncoding = hls.AttributeEncoding.RAHT
    qp: int = 4
    qp_chroma_offset: int = 0
    raht_integer_haar: bool = False
    # colourMatrix (reference TMC3.cpp:1270): 0 identity, 8 YCgCo-R.
    # YCgCo-R is exactly reversible => default for transform coding.
    cicp_matrix: int = 8
    # coded-value interpretation (reference attrScale/attrOffset)
    attr_scale: int = 1
    attr_offset: int = 0


@dataclass
class EncoderParams:
    """Encoder options (subset of the reference's ~190, TMC3.cpp:632)."""
    # positionQuantizationScale as a rational (reference seq scale)
    geom_scale_num: int = 1
    geom_scale_den: int = 1
    merge_duplicated_points: bool = True
    geometry_codec: hls.GeometryCodecType = hls.GeometryCodecType.OCTREE
    trisoup_node_size_log2: int = 0
    attributes: List[AttributeConfig] = field(default_factory=list)
    # slice/tile partitioning (reference partitioning.cpp; CLI
    # partitionMethod TMC3.cpp:781)
    partition_method: "partition_ops.PartitionMethod" = None
    max_points_per_slice: int = 1_100_000
    min_points_per_slice: int = 0
    partition_octree_depth: int = 1
    tile_size: int = 0
    # reference numOctreeEntropyStreams (TMC3.cpp:861): last N-1 octree
    # levels in separate, independently-decodable entropy streams
    num_entropy_streams: int = 1
    entropy_continuation: bool = False
    # carry adapted contexts into inter frames (reference
    # InterEntropyContinuationEnabled, TMC3.cpp)
    inter_entropy_continuation: bool = False
    frame_ctr_bits: int = 8
    # IDCM (reference inferredDirectCodingMode, TMC3.cpp).  Off by
    # default: with this framework's adaptive chain contexts, isolated
    # branches already cost ~1-2 bits/level, so direct coding only
    # saves ~3% on very sparse content while forcing the numpy engine.
    idcm: bool = False
    # inter prediction (reference TMC3.cpp:1113-1151)
    inter_prediction: bool = False
    random_access_period: int = 1     # 1 = all-intra
    global_motion: bool = False
    motion_file: Optional[str] = None
    # occupancy context mode (reference neighbourAvailBoundaryLog2>0):
    # True = 6-neighbour contexts, False = parent-occupancy (fast)
    neighbour_context: bool = True
    # geometry engine: auto | numpy | native | device
    engine: str = "auto"
    # predictive-geometry input ordering (reference predGeomSort)
    predgeom_sort_mode: "geometry_predictive.SortMode" = None
    # angular (spherical-domain) coding for LiDAR (reference
    # angularEnabled, TMC3.cpp cfg: angular tool set)
    angular_enabled: bool = False
    # internal axis permutation (reference geometry_axis_order,
    # TMC3.cpp:750)
    axis_order: hls.AxisOrder = hls.AxisOrder.XYZ

    def __post_init__(self):
        if self.predgeom_sort_mode is None:
            self.predgeom_sort_mode = geometry_predictive.SortMode.MORTON
        if self.partition_method is None:
            self.partition_method = partition_ops.PartitionMethod.NPTS


class FrameEncoder:
    """Sequence-scoped encoder state + per-frame compress()."""

    def __init__(self, params: EncoderParams):
        self.params = params
        self.sps: Optional[hls.SequenceParameterSet] = None
        self.gps: Optional[hls.GeometryParameterSet] = None
        self.aps: List[hls.AttributeParameterSet] = []
        self.frame_ctr = 0
        self._slice_id = 0
        self._geom_ctx: Optional[geometry_octree.OctreeContexts] = None
        self._trisoup_ctx: Optional[geometry_trisoup.TrisoupContexts] = None
        self._attr_ctx: Dict[int, attr_model.AttributeContexts] = {}
        # inter state (reference refFrame bookkeeping, encoder.cpp:502)
        self._ref_frame: Optional[np.ndarray] = None   # grid positions
        self._motion_params = (motion_ops.MotionParameters.parse_file(
            params.motion_file) if params.motion_file else None)

    # -- parameter-set derivation (reference deriveParameterSets,
    #    encoder.cpp:677) ---------------------------------------------
    def _derive_parameter_sets(self, cloud: PointCloud):
        p = self.params
        sps = hls.SequenceParameterSet(
            frame_ctr_bits=p.frame_ctr_bits,
            geom_scale_num=p.geom_scale_num,
            geom_scale_den=p.geom_scale_den,
            geom_axis_order=p.axis_order,
            entropy_continuation_enabled=p.entropy_continuation,
            inter_entropy_continuation_enabled=p.inter_entropy_continuation,
        )
        for ac in p.attributes:
            ncomp = 3 if ac.label == "color" else 1
            cicp = ac.cicp_matrix if (
                ac.label == "color"
                and ac.encoding != hls.AttributeEncoding.RAW) else 0
            sps.attributes.append(hls.AttributeDescription(
                label=ac.label, num_components=ncomp,
                bitdepth=ac.bitdepth, cicp_matrix=cicp,
                attr_scale=ac.attr_scale, attr_offset=ac.attr_offset))
        gps = hls.GeometryParameterSet(
            codec_type=p.geometry_codec,
            unique_points=p.merge_duplicated_points,
            neighbour_context_enabled=p.neighbour_context,
            inferred_direct_coding_mode=1 if (
                p.idcm and p.merge_duplicated_points) else 0,
            trisoup_node_size_log2=p.trisoup_node_size_log2,
            interPredictionEnabled=p.inter_prediction,
            globalMotionEnabled=p.global_motion,
            angular_enabled=p.angular_enabled,
        )
        aps_list = []
        for i, ac in enumerate(p.attributes):
            aps_list.append(hls.AttributeParameterSet(
                aps_id=i, attr_encoding=ac.encoding, init_qp=ac.qp,
                chroma_qp_offset=ac.qp_chroma_offset,
                raht_integer_haar=ac.raht_integer_haar))
        self.sps, self.gps, self.aps = sps, gps, aps_list

    # -- tile + slice partitioning (reference encoder.cpp:340-473) ----
    def _partition(self, cloud: PointCloud,
                   out: Callable[[PayloadBuffer], None]
                   ) -> List[PointCloud]:
        p = self.params
        if p.tile_size > 0:
            tiles, inventory = partition_ops.tile_partition(
                cloud.positions, p.tile_size)
            out(PayloadBuffer(
                PayloadType.TILE_INVENTORY,
                hls.TileInventory(tiles=inventory).write()))
        else:
            tiles = [np.arange(cloud.count)]
        result = []
        for tidx in tiles:
            tcloud = cloud.take(tidx)
            for sidx in partition_ops.partition_slices(
                    tcloud.positions, p.partition_method,
                    max_points=p.max_points_per_slice,
                    min_points=p.min_points_per_slice,
                    octree_depth=p.partition_octree_depth):
                result.append(tcloud.take(sidx))
        return result

    def compress(self, cloud: PointCloud,
                 out: Callable[[PayloadBuffer], None]):
        """Compress one frame; emits payloads through `out`."""
        p = self.params
        first_frame = self.sps is None
        if first_frame:
            self._derive_parameter_sets(cloud)
            out(PayloadBuffer(PayloadType.SEQUENCE_PARAMETER_SET,
                              self.sps.write()))
            out(PayloadBuffer(PayloadType.GEOMETRY_PARAMETER_SET,
                              self.gps.write()))
            for a in self.aps:
                out(PayloadBuffer(PayloadType.ATTRIBUTE_PARAMETER_SET,
                                  a.write()))

        # axis permutation into internal stv order (reference
        # convertXyzToStv, decoder.cpp:347-369)
        positions = cloud.positions[:, self.sps.geom_axis_order.perm]
        # input quantisation (reference encoder.cpp:1554-1577).  Scale
        # only; per-slice origins are signalled absolute in grid units,
        # so no sequence origin enters the reconstruction path.
        grid = processing.quantize_positions(
            positions, p.geom_scale_num, p.geom_scale_den, (0, 0, 0))
        qcloud = PointCloud(grid, cloud.colors, cloud.reflectances,
                            cloud.frame_index)
        if p.merge_duplicated_points:
            qcloud = processing.dedup_with_attributes(qcloud)

        frame_ctr_lsb = self.frame_ctr & ((1 << self.sps.frame_ctr_bits) - 1)
        if not first_frame:
            out(PayloadBuffer(
                PayloadType.FRAME_BOUNDARY_MARKER,
                hls.FrameBoundaryMarker(frame_ctr_lsb).write()))

        # frame type: I every random_access_period frames (reference
        # SequenceEncoder RA periods, TMC3.cpp:2162-2183); inter only
        # for the octree codec in this round
        rap = max(p.random_access_period, 1)
        is_inter = (p.inter_prediction
                    and self._ref_frame is not None
                    and self.frame_ctr % rap != 0
                    and p.geometry_codec == hls.GeometryCodecType.OCTREE)
        gm = None
        if is_inter:
            if self._motion_params is not None:
                gm = self._motion_params.for_frame(self.frame_ctr)
            elif p.global_motion:
                gm = motion_ops.estimate_global_motion(
                    self._ref_frame, qcloud.positions)
            else:
                gm = motion_ops.identity_motion()

        keep_ctx = is_inter and p.inter_entropy_continuation
        for scloud in self._partition(qcloud, out):
            self._compress_slice(scloud, frame_ctr_lsb, out,
                                 gm=gm if is_inter else None,
                                 keep_ctx=keep_ctx)
            keep_ctx = p.entropy_continuation
        self._ref_frame = qcloud.positions.astype(np.int64)
        self.frame_ctr += 1

    # -- per-slice coding (reference compressPartition,
    #    encoder.cpp:924) --------------------------------------------
    def _compress_slice(self, cloud: PointCloud, frame_ctr_lsb: int,
                        out: Callable[[PayloadBuffer], None], gm=None,
                        keep_ctx: Optional[bool] = None):
        p = self.params
        slice_origin = cloud.bbox()[0]
        local = cloud.positions.astype(np.int64) - slice_origin
        maxv = int(local.max()) if cloud.count else 0
        depth = max(int(maxv).bit_length(), 1) if cloud.count else 1

        if keep_ctx is None:
            keep_ctx = p.entropy_continuation
        continuing = keep_ctx and self._geom_ctx is not None
        if not continuing:
            self._geom_ctx = geometry_octree.OctreeContexts()
            self._trisoup_ctx = geometry_trisoup.TrisoupContexts()
            self._predgeom_ctx = geometry_predictive.PredGeomContexts()
            self._attr_ctx = {
                i: attr_model.AttributeContexts()
                for i in range(len(self.aps))}

        from ..ops import octree as octree_ops
        ctx_mode = (octree_ops.CTX_MODE_NEIGH
                    if self.gps.neighbour_context_enabled
                    else octree_ops.CTX_MODE_PARENT)
        enc = entropy.RangeEncoder()
        trisoup = (self.gps.codec_type == hls.GeometryCodecType.TRISOUP
                   and self.gps.trisoup_node_size_log2 > 0)
        multistream = (p.num_entropy_streams > 1 and gm is None
                       and self.gps.unique_points and not trisoup
                       and self.gps.codec_type
                       == hls.GeometryCodecType.OCTREE)
        recon_local = None
        order = None
        if trisoup:
            recon_local = geometry_trisoup.encode(
                local, depth, self.gps.trisoup_node_size_log2, enc,
                self._geom_ctx, self._trisoup_ctx,
                engine=p.engine, ctx_mode=ctx_mode)
        elif self.gps.codec_type == hls.GeometryCodecType.PREDICTIVE:
            order = geometry_predictive.encode(
                local, enc, self._predgeom_ctx,
                sort_mode=p.predgeom_sort_mode,
                angular=self.gps.angular_enabled)
        elif multistream:
            streams, order = geometry_octree.encode_multistream(
                local, depth, self._geom_ctx, p.num_entropy_streams,
                ctx_mode=ctx_mode)
        else:
            ref_codes = None
            if gm is not None:
                from ..utils import morton as morton_mod
                comp = motion_ops.apply_global_motion(
                    self._ref_frame, gm[0], gm[1]) - slice_origin
                inb = np.all((comp >= 0) & (comp < (1 << depth)), axis=1)
                ref_codes = np.unique(morton_mod.encode(comp[inb]))
            order = geometry_octree.encode(
                local, depth, enc, self._geom_ctx,
                unique_points=self.gps.unique_points,
                engine=p.engine, ctx_mode=ctx_mode, ref_codes=ref_codes,
                idcm=self.gps.inferred_direct_coding_mode > 0,
                need_order=bool(self.aps))
        if not multistream:
            streams = [enc.get_bytes()]

        num_points = (int(recon_local.shape[0]) if trisoup
                      else cloud.count)
        if gm is not None:
            gm_mat = tuple(int(v) for v in gm[0].reshape(-1))
            gm_trans = tuple(int(v) for v in gm[1])
        else:
            gm_mat, gm_trans = (65536, 0, 0, 0, 65536, 0, 0, 0, 65536), \
                (0, 0, 0)
        gbh = hls.GeometryBrickHeader(
            is_inter=gm is not None,
            gm_matrix=gm_mat,
            gm_trans=gm_trans,
            gps_id=self.gps.gps_id,
            slice_id=self._slice_id,
            frame_ctr_lsb=frame_ctr_lsb,
            slice_origin=tuple(int(v) for v in np.asarray(slice_origin)),
            root_node_size_log2=depth,
            num_points=num_points,
            entropy_continuation=continuing,
            prev_slice_id=self._slice_id - 1,
            stream_lens=[len(s) for s in streams],
        )
        out(PayloadBuffer(PayloadType.GEOMETRY_BRICK,
                          gbh.write() + b"".join(streams)))

        if not self.aps:
            coded = None
            dec_positions = None
        elif trisoup:
            # geometry changed: transfer attributes onto the decoded
            # positions (reference recolour, encoder.cpp:1031-1037)
            from ..ops import recolour as recolour_ops
            src = PointCloud(local, cloud.colors, cloud.reflectances)
            coded = recolour_ops.recolour(src, recon_local)
            dec_positions = recon_local
        else:
            # decoded-order positions for the attribute transforms
            coded = cloud.take(order)
            dec_positions = coded.positions.astype(np.int64) - slice_origin

        for i, (aps, desc) in enumerate(zip(self.aps, self.sps.attributes)):
            values = (coded.colors if desc.label == "color"
                      else coded.reflectances)
            if values is None:
                continue
            values = np.asarray(values)
            if desc.attr_scale != 1 or desc.attr_offset != 0:
                # scaleAttributesForInput (reference TMC3.cpp:2233-2236)
                values = (values.astype(np.int64) - desc.attr_offset
                          + desc.attr_scale // 2) // desc.attr_scale
            if desc.cicp_matrix == 8:
                values = processing.rgb_to_ycgcor(values)
            elif desc.cicp_matrix == 1:
                values = processing.rgb_to_ycbcr_bt709(
                    values, desc.bitdepth)
            # constant attribute shortcut (reference constant-attribute
            # data unit, decoder.cpp:994); values are in the coded
            # colourspace so the decoder's inverse applies uniformly.
            # ue(v) coding needs non-negative: bias by bitdepth+1 range.
            flat = values.reshape(values.shape[0], -1)
            if flat.size and np.all(flat == flat[0]):
                bias = 1 << (desc.bitdepth + 1)
                out(PayloadBuffer(
                    PayloadType.CONSTANT_ATTRIBUTE,
                    hls.ConstantAttribute(
                        aps_id=aps.aps_id, sps_attr_idx=i,
                        slice_id=self._slice_id,
                        values=tuple(int(v) + bias
                                     for v in flat[0])).write()))
                continue
            body = attr_model.encode(
                values, dec_positions, aps, desc, self._attr_ctx[i])
            abh = hls.AttributeBrickHeader(
                aps_id=aps.aps_id, sps_attr_idx=i,
                slice_id=self._slice_id)
            out(PayloadBuffer(PayloadType.ATTRIBUTE_BRICK,
                              abh.write() + body))
        self._slice_id += 1
