"""Trisoup geometry codec: octree-to-node-size + edge-vertex surface.

Counterpart of `encodeGeometryTrisoup` (geometry_trisoup_encoder.cpp:49)
/ `decodeGeometryTrisoup` (geometry_trisoup_decoder.cpp:124).  The
octree front-end is the existing octree codec with its depth reduced by
`trisoup_node_size_log2`; the surface payload is, per unique node edge
(canonical order, ops/trisoup.py): a presence bit and a position, both
through the contextual vertex coder, then a quantised centroid drift
per eligible node.  Reconstruction (ops/trisoup2.py) follows the
reference surface model: inflated-cube fixed-point vertices, pseudo-arc
ordering, L1-weighted centroid + drift along the surface normal, and
integer two-axis ray tracing with the automatic sampling loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import entropy
from ..ops import octree as octree_ops
from ..ops import trisoup as trisoup_ops
from ..ops import trisoup2
from ..utils import morton
from . import geometry_octree

VTX_CTX_SIZE = 704   # trisoup v2 vertex coder (rce_trisoup_verts2):
                     # [0,324) presence (closeness x multiplicity x
                     # flank x density x direction); [324,660) top-3
                     # contextual position bits; [660+) tail bits
FACE_CTX_SIZE = 2    # retained for context-layout compatibility
_CENT_AXIS_CTX = 26  # resbl layout for the drift components


@dataclass
class TrisoupContexts:
    vertex: np.ndarray = field(
        default_factory=lambda: entropy.new_contexts(VTX_CTX_SIZE))
    centroid: np.ndarray = field(
        default_factory=lambda: entropy.new_contexts(3 * _CENT_AXIS_CTX))
    face: np.ndarray = field(
        default_factory=lambda: entropy.new_contexts(FACE_CTX_SIZE))

    def copy(self):
        return TrisoupContexts(self.vertex.copy(), self.centroid.copy(),
                               self.face.copy())


def _ref_gps(gps, depth: int, s: int):
    """RefGps + QTBT axis list for a reference-exact trisoup brick
    embedded in a native-syntax slice (geometry_obuf engine).  The
    trisoup QTBT-first override (geometry_octree.cpp:114-118) with a
    cubic root degenerates to plain octree levels truncated at the
    node size."""
    from ..conformance.encoder import qtbt_axis_list
    from . import geometry_obuf
    rg = geometry_obuf._gps_flags(gps)
    rg.trisoup_enabled = True
    rg.non_cubic_node_start_edge = True
    rg.non_cubic_node_end_edge = True
    axes = np.asarray(
        qtbt_axis_list([depth] * 3, True, max_num_qtbt_before_ot=0,
                       min_qtbt_size_log2=0, stop_log2=s),
        dtype=np.int32)
    return rg, axes


def _encode_ref(local: np.ndarray, depth: int, s: int, enc, gps,
                halo: bool, centroid: bool, face_vertices: bool):
    """Reference-exact trisoup brick (native syntax, obuf engine):
    octree phase + trained dynamic-OBUF vertex coder + centroid/face
    stages ride ONE embedded dirac payload, byte-identical machinery
    to the tmc3 interop path — geometry RD equals the reference
    encoder's (encodeGeometryTrisoup,
    /root/reference/tmc3/geometry_trisoup_encoder.cpp:100-246).
    The payload plus a small bypass header (lengths, sampling, slice
    bbox for non-cubic boundary nodes) is embedded in the native
    range-coded stream."""
    from ..conformance.encoder import _encode_trisoup_brick_native
    rg, axes = _ref_gps(gps, depth, s)
    stv = np.ascontiguousarray(local, dtype=np.int32)
    aec, fields, recon = _encode_trisoup_brick_native(
        stv, axes, rg, s, halo=halo, adaptive_halo=halo,
        face_vertex=face_vertices, centroid_residual=centroid)
    bb_pos = fields["slice_bb_pos"]
    bb_width = fields["slice_bb_width"]
    hdr = np.array([
        len(aec), fields["num_unique_segments"],
        fields["trisoup_sampling"], recon.shape[0],
        fields["slice_bb_pos_bits"], fields["slice_bb_width_bits"],
        bb_pos[0], bb_pos[1], bb_pos[2],
        bb_width[0], bb_width[1], bb_width[2],
    ], dtype=np.uint32)
    enc.bypass(hdr, np.full(hdr.size, 32, dtype=np.int32))
    enc.bypass(np.frombuffer(aec, dtype=np.uint8).astype(np.uint32),
               np.full(len(aec), 8, dtype=np.int32))
    return recon.astype(np.int64)


def _decode_ref(depth: int, s: int, dec, gps, max_nodes: int,
                halo: bool, centroid: bool, face_vertices: bool):
    """Decode mirror of _encode_ref."""
    from ..conformance.decoder import (decode_trisoup_payload,
                                       geom_params_array)
    hdr = dec.bypass(np.full(12, 32, dtype=np.int32))
    n_bytes, nseg, sampling, recon_cnt = (int(v) for v in hdr[:4])
    pos_bits, width_bits = int(hdr[4]), int(hdr[5])
    bb_min = hdr[6:9].astype(np.int32)
    bb_max = (hdr[6:9].astype(np.int64)
              + hdr[9:12].astype(np.int64)).astype(np.int32)
    raw = dec.bypass(np.full(n_bytes, 8, dtype=np.int32))
    aec = raw.astype(np.uint8).tobytes()
    rg, axes = _ref_gps(gps, depth, s)
    gp = geom_params_array(rg, True)
    out = decode_trisoup_payload(
        aec, axes, gp, s,
        cap=max(max_nodes, recon_cnt, 1_100_000),
        sampling=sampling, halo=halo, adaptive_halo=halo,
        fine_ray=True, face_vertex=face_vertices,
        centroid_residual=centroid, vertex_quant_bits=0,
        flag_n=int(pos_bits > 0), flag_f=int(width_bits > 0),
        bb_min=bb_min, bb_max=bb_max,
        expected_nseg=nseg, expected_points=recon_cnt)
    return out


def encode(positions: np.ndarray, depth: int, node_size_log2: int, enc,
           octx: geometry_octree.OctreeContexts, tctx: TrisoupContexts,
           engine: str = "auto",
           ctx_mode: int = octree_ops.CTX_MODE_NEIGH,
           face_vertices: bool = False, halo: bool = True,
           centroid: bool = True, pad_points: np.ndarray = None,
           bbox_max=None, obuf_gps=None):
    """Encode geometry; returns reconstructed positions (for attribute
    recolouring) — the decoder reproduces them exactly.

    pad_points: slice-local positions from NEIGHBOURING slices near
    this slice's boundary (reference sliceCloudPadding,
    encoder.cpp:550-559); they join the vertex voting only (v2 path).
    With the OBUF engine the whole brick runs the reference-exact
    trisoup coder (_encode_ref): face_vertices then selects the
    reference face-vertex stage; on the v2 path it is accepted for
    option compatibility only."""
    s = min(node_size_log2, depth)
    octree_depth = depth - s

    # obuf engine: the whole brick (octree phase + trained
    # dynamic-OBUF vertex maps + centroids + faces) is one embedded
    # reference-exact dirac payload — geometry RD equals tmc3's
    if obuf_gps is not None and octree_depth > 0 and len(positions):
        return _encode_ref(positions, depth, s, enc, obuf_gps,
                           halo=halo, centroid=centroid,
                           face_vertices=face_vertices)

    codes = morton.encode(positions.astype(np.int64))
    codes_sorted = np.sort(codes)
    node_codes = np.unique(codes_sorted >> (3 * s))
    node_pos = morton.decode(node_codes)
    geometry_octree.encode(node_pos, octree_depth, enc, octx,
                           unique_points=True, engine=engine,
                           ctx_mode=ctx_mode)

    # vertex voting over the full-resolution points; padding points
    # from neighbouring slices join existing nodes only
    pts = morton.decode(codes_sorted)
    point_node = np.searchsorted(node_codes, codes_sorted >> (3 * s))
    vpts, vnode = pts, point_node
    if pad_points is not None and len(pad_points):
        pcodes = np.sort(morton.encode(
            np.asarray(pad_points, dtype=np.int64)))
        pnode = np.searchsorted(node_codes, pcodes >> (3 * s))
        pnode = np.minimum(pnode, node_codes.size - 1)
        hit = node_codes[pnode] == (pcodes >> (3 * s))
        if hit.any():
            vpts = np.concatenate([pts, morton.decode(pcodes[hit])])
            vnode = np.concatenate([point_node, pnode[hit]])
            order = np.argsort(vnode, kind="stable")
            vpts, vnode = vpts[order], vnode[order]

    n_unique = int(np.unique(codes_sorted).shape[0])
    dse = trisoup2.distance_search(node_codes.shape[0], n_unique,
                                   1 << s)
    uniq, present, vpos = trisoup2.determine_vertices(
        vpts, node_codes, vnode, s, dse)

    # serialise through the v2 contextual vertex coder (9-neighbour
    # edge conditioning, reference decodeTrisoupVerticesSub variables)
    order, nbr, orient, cmlt, nbef, naft, dirn = \
        trisoup2.edge_coder_features(node_codes, uniq, s)
    enc.trisoup_verts2(tctx.vertex, present.astype(np.uint8),
                       vpos.astype(np.int32), order, nbr, orient,
                       cmlt, nbef, naft, dirn, s)

    # centroid drift along the node normal for >3-vertex nodes
    verts, mask = trisoup2.node_vertices_fp(node_codes, uniq, present,
                                            vpos, s)
    ns = trisoup2.build_surface(verts, mask, s)
    driftq = np.zeros(node_codes.shape[0], dtype=np.int64)
    if centroid:
        _, origin = trisoup_ops.edge_keys_for_nodes(node_codes, s)
        driftq = trisoup2.determine_drift(pts, point_node, origin, ns,
                                          s)
        rows = np.nonzero(ns.drift_ok)[0]
        enc.resbl(tctx.centroid[:_CENT_AXIS_CTX],
                  driftq[rows].astype(np.int32))

    target = max(n_unique, node_codes.shape[0])
    bb = (1 << depth) - 1 if bbox_max is None else bbox_max
    return trisoup2.reconstruct(
        node_codes, uniq, present, vpos, s, driftq, target,
        halo_flag=halo, bbox_max=bb)


def decode(depth: int, node_size_log2: int, dec,
           octx: geometry_octree.OctreeContexts, tctx: TrisoupContexts,
           max_nodes: int, engine: str = "auto",
           ctx_mode: int = octree_ops.CTX_MODE_NEIGH,
           face_vertices: bool = False, halo: bool = True,
           centroid: bool = True, bbox_max=None, obuf_gps=None):
    s = min(node_size_log2, depth)
    octree_depth = depth - s
    if obuf_gps is not None and octree_depth > 0:
        return _decode_ref(depth, s, dec, obuf_gps, max_nodes,
                           halo=halo, centroid=centroid,
                           face_vertices=face_vertices)
    node_pos = geometry_octree.decode(
        max_nodes, octree_depth, dec, octx, unique_points=True,
        engine=engine, ctx_mode=ctx_mode)
    node_codes = morton.encode(node_pos)

    keys, _ = trisoup_ops.edge_keys_for_nodes(node_codes, s)
    uniq, _ = trisoup_ops.unique_edges(keys)
    ne = uniq.shape[0]
    order, nbr, orient, cmlt, nbef, naft, dirn = \
        trisoup2.edge_coder_features(node_codes, uniq, s)
    pres8, vpos32 = dec.trisoup_verts2(tctx.vertex, order, nbr, orient,
                                       cmlt, nbef, naft, dirn, ne, s)
    present = pres8.astype(bool)
    vpos = vpos32.astype(np.int64)

    verts, mask = trisoup2.node_vertices_fp(node_codes, uniq, present,
                                            vpos, s)
    ns = trisoup2.build_surface(verts, mask, s)
    driftq = np.zeros(node_codes.shape[0], dtype=np.int64)
    if centroid:
        rows = np.nonzero(ns.drift_ok)[0]
        vals = dec.resbl(tctx.centroid[:_CENT_AXIS_CTX], rows.size)
        driftq[rows] = vals
        driftq = np.minimum(np.maximum(driftq, -ns.low_bound),
                            ns.high_bound)

    bb = (1 << depth) - 1 if bbox_max is None else bbox_max
    return trisoup2.reconstruct(node_codes, uniq, present, vpos, s,
                                driftq, max_nodes, halo_flag=halo,
                                bbox_max=bb)
