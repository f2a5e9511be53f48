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
    encoder.cpp:550-559); they join the vertex voting only.
    face_vertices is accepted for option compatibility; the v2 surface
    model does not code face vertices."""
    s = min(node_size_log2, depth)
    octree_depth = depth - s
    codes = morton.encode(positions.astype(np.int64))
    codes_sorted = np.sort(codes)
    node_codes = np.unique(codes_sorted >> (3 * s))

    # octree part over node codes.  With the OBUF engine the node
    # octree rides an embedded dirac sub-stream (reference-class
    # occupancy compression, models/geometry_obuf.py); node count and
    # byte length are bypass-signalled ahead of it.
    node_pos = morton.decode(node_codes)
    if obuf_gps is not None and octree_depth > 0 and node_pos.size:
        from . import geometry_obuf
        payload = geometry_obuf.encode(
            node_pos, octree_depth, (octree_depth,) * 3, obuf_gps)
        enc.bypass(np.array([len(node_codes), len(payload)],
                            dtype=np.uint32),
                   np.array([32, 32], dtype=np.int32))
        enc.bypass(np.frombuffer(payload, dtype=np.uint8)
                   .astype(np.uint32),
                   np.full(len(payload), 8, dtype=np.int32))
    else:
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
        from . import geometry_obuf
        hdr = dec.bypass(np.array([32, 32], dtype=np.int32))
        n_nodes, n_bytes = int(hdr[0]), int(hdr[1])
        raw = dec.bypass(np.full(n_bytes, 8, dtype=np.int32))
        payload = raw.astype(np.uint8).tobytes()
        node_pos = geometry_obuf.decode(payload, n_nodes,
                                        octree_depth,
                                        (octree_depth,) * 3, obuf_gps)
    else:
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
