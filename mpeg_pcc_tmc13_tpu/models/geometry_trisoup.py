"""Trisoup geometry codec: octree-to-node-size + edge-vertex surface.

Counterpart of `encodeGeometryTrisoup` (geometry_trisoup_encoder.cpp:49)
/ `decodeGeometryTrisoup` (geometry_trisoup_decoder.cpp:124).  The
octree front-end is the existing octree codec with its depth reduced by
`trisoup_node_size_log2`; the surface payload is, per unique node edge
(canonical order, ops/trisoup.py): a presence bit (context chained on
the previous edge's presence — the Morton-adjacent edge) and a bypass
position of log2(node size) bits.  Reconstruction (shared by both
sides, also used for encoder-side recolouring) fans each node's
vertices into triangles and voxelises them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import entropy
from ..ops import octree as octree_ops
from ..ops import trisoup as trisoup_ops
from ..utils import morton
from . import geometry_octree

VTX_CTX_SIZE = 120   # trisoup vertex coder (entropy rce_trisoup_verts):
                     # 72 presence contexts (adjacent-node count x
                     # previous edge x 2 parallel-predecessor states)
                     # + 3 per position bit (neighbour-predicted bit)
FACE_CTX_SIZE = 2    # face presence chained on the previous face
_CENT_AXIS_CTX = 26  # resbl layout per axis


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
           face_vertices: bool = False, halo: bool = False,
           centroid: bool = True, pad_points: np.ndarray = None,
           bbox_max=None):
    """Encode geometry; returns reconstructed positions (for attribute
    recolouring) — the decoder reproduces them exactly.

    pad_points: slice-local positions from NEIGHBOURING slices near
    this slice's boundary (reference sliceCloudPadding,
    encoder.cpp:550-559).  They join the vertex estimation for nodes
    they fall into — so the surface crossing a slice border produces
    the same shared-face vertices on both sides — but create no nodes
    and are not reconstructed.  bbox_max: per-axis inclusive clip of
    the reconstruction (reference non-cubic boundary nodes,
    geometry_trisoup_decoder.cpp:532)."""
    s = min(node_size_log2, depth)
    octree_depth = depth - s
    codes = morton.encode(positions.astype(np.int64))
    codes_sorted = np.sort(codes)
    node_codes = np.unique(codes_sorted >> (3 * s))

    # octree part over node codes
    node_pos = morton.decode(node_codes)
    geometry_octree.encode(node_pos, octree_depth, enc, octx,
                           unique_points=True, engine=engine,
                           ctx_mode=ctx_mode)

    # vertex determination over the full-resolution points; padding
    # points from neighbouring slices join existing nodes only
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
    uniq, present, vpos = trisoup_ops.determine_vertices(
        vpts, node_codes, vnode, s)

    # serialise through the contextual vertex coder (presence
    # conditioned on edge neighbourhood, position bits on the
    # parallel-neighbour prediction)
    nadj, prev1, prev2 = trisoup_ops.edge_neighbor_structure(
        uniq, s, node_codes)
    enc.trisoup_verts(tctx.vertex, present.astype(np.uint8),
                      vpos.astype(np.int32), nadj, prev1, prev2, s)

    # centroid drift for >=3-vertex nodes: a single component along
    # the node's dominant (normal-like) axis, like the reference's
    # driftQ (geometry_trisoup_encoder.cpp:852) — the tangential
    # residual moves the centroid along the surface and isn't worth
    # its bits.  Estimated from EDGE vertices only (reference order:
    # eVerts -> cVerts -> face vertices).
    if centroid:
        resid3 = trisoup_ops.true_centroid_residuals(
            pts, node_codes, point_node, uniq, present, vpos, s)
        counts = trisoup_ops.vertex_counts(node_codes, uniq, present, s)
        sel = counts >= 3
        dom = trisoup_ops.node_dominant_axis(
            node_codes, uniq, present, vpos, s)
        rows = np.nonzero(sel)[0]
        drift = resid3[rows, dom[rows]]
        enc.resbl(tctx.centroid[:_CENT_AXIS_CTX],
                  drift.astype(np.int32))
        resid = np.zeros((node_codes.shape[0], 3), dtype=np.int64)
        resid[rows, dom[rows]] = drift
    else:
        resid = np.zeros((node_codes.shape[0], 3), dtype=np.int64)

    # face vertices: candidates + positions DERIVED from the two
    # adjacent centroids (reference determineTrisoupFaceVertices);
    # only the connect flag is coded, one adaptive bit per candidate
    # (encodeTrisoupFaceList, geometry_trisoup_encoder.cpp:1070)
    faces = None
    if face_vertices:
        fuq, cand, fpos = trisoup_ops.derive_face_vertices(
            node_codes, present, vpos, s, centroid_resid=resid)
        fpres = trisoup_ops.face_vertex_supported(
            codes_sorted, fuq, cand, fpos, s)
        crow = np.flatnonzero(cand)
        enc.bits(tctx.face, np.zeros(crow.size, dtype=np.int32),
                 fpres[crow].astype(np.uint8))
        faces = (fpres, fpos)
    resid = trisoup_ops.centroid_resid_with_faces(
        node_codes, present, vpos, s, resid, faces)

    bb = (1 << depth) - 1 if bbox_max is None else bbox_max
    recon = trisoup_ops.reconstruct(
        node_codes, uniq, present, vpos, s,
        bbox_max=bb, centroid_resid=resid, faces=faces,
        halo=halo)
    return recon


def decode(depth: int, node_size_log2: int, dec,
           octx: geometry_octree.OctreeContexts, tctx: TrisoupContexts,
           max_nodes: int, engine: str = "auto",
           ctx_mode: int = octree_ops.CTX_MODE_NEIGH,
           face_vertices: bool = False, halo: bool = False,
           centroid: bool = True, bbox_max=None):
    s = min(node_size_log2, depth)
    octree_depth = depth - s
    node_pos = geometry_octree.decode(
        max_nodes, octree_depth, dec, octx, unique_points=True,
        engine=engine, ctx_mode=ctx_mode)
    node_codes = morton.encode(node_pos)

    keys, _ = trisoup_ops.edge_keys_for_nodes(node_codes, s)
    uniq, _ = trisoup_ops.unique_edges(keys)
    ne = uniq.shape[0]
    nadj, prev1, prev2 = trisoup_ops.edge_neighbor_structure(
        uniq, s, node_codes)
    pres8, vpos32 = dec.trisoup_verts(tctx.vertex, nadj, prev1, prev2,
                                      ne, s)
    present = pres8.astype(bool)
    vpos = vpos32.astype(np.int64)

    # centroid drift first (edge-only estimate), then the derived
    # face-vertex connect flags — mirroring the encoder's order
    resid = np.zeros((node_codes.shape[0], 3), dtype=np.int64)
    if centroid:
        counts = trisoup_ops.vertex_counts(node_codes, uniq, present, s)
        sel = counts >= 3
        nsel = int(sel.sum())
        dom = trisoup_ops.node_dominant_axis(
            node_codes, uniq, present, vpos, s)
        rows = np.nonzero(sel)[0]
        drift = dec.resbl(tctx.centroid[:_CENT_AXIS_CTX], nsel)
        resid[rows, dom[rows]] = drift

    faces = None
    if face_vertices:
        fuq, cand, fpos = trisoup_ops.derive_face_vertices(
            node_codes, present, vpos, s, centroid_resid=resid)
        crow = np.flatnonzero(cand)
        flags = dec.bits(tctx.face,
                         np.zeros(crow.size, dtype=np.int32))
        fpres = np.zeros(fuq.shape[0], dtype=bool)
        fpres[crow] = flags.astype(bool)
        faces = (fpres, fpos)
    resid = trisoup_ops.centroid_resid_with_faces(
        node_codes, present, vpos, s, resid, faces)

    bb = (1 << depth) - 1 if bbox_max is None else bbox_max
    return trisoup_ops.reconstruct(node_codes, uniq, present, vpos, s,
                                   bbox_max=bb,
                                   centroid_resid=resid, faces=faces,
                                   halo=halo)
