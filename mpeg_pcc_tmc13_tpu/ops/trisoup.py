"""Trisoup surface-coding passes: edge vertices + triangle voxelisation.

Counterpart of the reference trisoup coder (`determineTrisoupVertices`
geometry_trisoup_encoder.cpp:336, `decodeTrisoupCommon`
geometry_trisoup_decoder.cpp:675, triangle ordering geometry_trisoup.h:
71-94, `rayTracingAlongdirection` :1357).

TPU-first redesign:
* the octree runs down to trisoup-node size 2**s (existing octree
  coder, depth reduced by s),
* the unique-edge set of all leaf nodes is derived identically on both
  sides from the node codes (canonical keys, sorted) — no signalling,
* per-edge vertex presence/position comes from a vectorised
  point-to-edge adjacency reduction (replaces the per-node scan),
* reconstruction rasterises each node's triangle fan by **dense
  barycentric sampling** (a fixed SxS sample grid per triangle,
  rounded to voxels) instead of serial ray marching — identical on
  encoder (for recolouring) and decoder.
"""

from __future__ import annotations

import numpy as np

from ..utils import morton

# the 12 edges of a cube: (axis, perpendicular corner offsets).
# For edge e: axis = _EDGE_AXIS[e]; the two perpendicular axes take
# corner values (0 or 1) scaled by node width.
_EDGE_AXIS = np.array([0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2])
_EDGE_C1 = np.array([0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1])
_EDGE_C2 = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1])
# perpendicular axes per edge axis
_PERP = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


def edge_keys_for_nodes(node_codes: np.ndarray, log2_size: int):
    """(12*M,) canonical edge keys + per-node edge references.

    Edge key packs (axis, start position in voxels) uniquely:
    key = axis * 8^22 + morton(start).  Keys of coincident edges from
    neighbouring nodes collide (that's the point): vertices are shared.
    Returns (keys (M,12) int64, node_origin (M,3) int64).
    """
    w = 1 << log2_size
    origin = morton.decode(node_codes) * w          # (M,3)
    m = node_codes.shape[0]
    keys = np.zeros((m, 12), dtype=np.int64)
    for e in range(12):
        ax = _EDGE_AXIS[e]
        p1, p2 = _PERP[ax]
        start = origin.copy()
        start[:, p1] += _EDGE_C1[e] * w
        start[:, p2] += _EDGE_C2[e] * w
        keys[:, e] = morton.encode(start) + np.int64(ax) * (np.int64(1) << 60)
    return keys, origin


def unique_edges(keys: np.ndarray):
    """Sorted unique edge keys + inverse map (M,12)->unique index."""
    uniq, inv = np.unique(keys.reshape(-1), return_inverse=True)
    return uniq, inv.reshape(keys.shape)


def edge_neighbor_structure(uniq_keys: np.ndarray, log2_size: int,
                            node_codes: np.ndarray):
    """Per unique edge: the context inputs for the vertex coder
    (entropy rce_trisoup_verts; reference neighbNodes/edgePattern,
    geometry_trisoup_encoder.cpp:1078).

    Returns (nadj, prev1, prev2): the number of occupied nodes sharing
    each edge (1..4), and the indices of the two parallel predecessor
    edges — same axis, one node size back along each perpendicular
    axis (-1 when absent).  Both predecessors sort strictly earlier
    (morton is monotone per coordinate), so a sequential coder can
    condition on their decoded presence/positions."""
    keys, _ = edge_keys_for_nodes(node_codes, log2_size)
    idx = np.searchsorted(uniq_keys, keys.reshape(-1))
    nadj = np.bincount(idx, minlength=uniq_keys.size).astype(np.int32)

    w = np.int64(1 << log2_size)
    tag = uniq_keys >> 60
    start = morton.decode(uniq_keys & ((np.int64(1) << 60) - 1))
    p1 = np.array([_PERP[a][0] for a in range(3)])[tag]
    p2 = np.array([_PERP[a][1] for a in range(3)])[tag]
    n = uniq_keys.size
    rows = np.arange(n)
    out = []
    for perp in (p1, p2):
        st = start.copy()
        st[rows, perp] -= w
        ok = st[rows, perp] >= 0
        pk = morton.encode(np.maximum(st, 0)) + (tag << 60)
        j = np.searchsorted(uniq_keys, pk)
        j = np.minimum(j, n - 1)
        hit = ok & (uniq_keys[j] == pk)
        out.append(np.where(hit, j, -1).astype(np.int64))
    return nadj, out[0], out[1]


# faces: index f = axis*2 + side; plane at origin[axis] + side*size
def face_keys_for_nodes(node_codes: np.ndarray, log2_size: int):
    """(M,6) canonical face keys — coincident faces of neighbouring
    nodes collide (axis tag 4+a keeps them clear of edge keys)."""
    w = 1 << log2_size
    origin = morton.decode(node_codes) * w
    m = node_codes.shape[0]
    keys = np.zeros((m, 6), dtype=np.int64)
    for f in range(6):
        a, side = f // 2, f % 2
        corner = origin.copy()
        corner[:, a] += side * w
        keys[:, f] = morton.encode(corner) \
            + np.int64(4 + a) * (np.int64(1) << 60)
    return keys, origin


def determine_face_vertices(points: np.ndarray, node_codes: np.ndarray,
                            point_node_idx: np.ndarray, log2_size: int):
    """Encoder: per unique node face, an interior surface vertex
    (reference face vertices, encodeTrisoupFaceList
    geometry_trisoup_encoder.cpp:1062): present when points hug the
    face plane away from its edges; position = mean in-plane coords.

    Returns (face_keys_unique, present (F,), fpos (F,2))."""
    w = 1 << log2_size
    keys, origin = face_keys_for_nodes(node_codes, log2_size)
    uniq, inv = np.unique(keys.reshape(-1), return_inverse=True)
    inv = inv.reshape(keys.shape)
    nf = uniq.shape[0]
    counts = np.zeros(nf, dtype=np.int64)
    sums = np.zeros((nf, 2), dtype=np.int64)
    local = points.astype(np.int64) - origin[point_node_idx]
    for f in range(6):
        a, side = f // 2, f % 2
        p1, p2 = _PERP[a]
        plane = side * (w - 1)
        near = np.abs(local[:, a] - plane) <= 1
        # interior: clear of the face's own edges (those voxels feed
        # the edge vertices already)
        near &= (local[:, p1] >= 2) & (local[:, p1] <= w - 3)
        near &= (local[:, p2] >= 2) & (local[:, p2] <= w - 3)
        fidx = inv[point_node_idx, f]
        np.add.at(counts, fidx[near], 1)
        np.add.at(sums, fidx[near],
                  np.stack([local[near, p1], local[near, p2]], axis=1))
    present = counts > 0
    fpos = np.zeros((nf, 2), dtype=np.int64)
    fpos[present] = ((sums[present] + counts[present, None] // 2)
                     // counts[present, None])
    np.clip(fpos, 0, w - 1, out=fpos)
    return uniq, present, fpos


def _edge_centroids(node_codes, present, vpos, log2_size,
                    centroid_resid=None):
    """Per-node fan centroid from EDGE vertices only (+ drift).
    Returns (cent (M,3) float, has_c (M,) bool)."""
    vw, pres = _node_vertices(node_codes, present, vpos, log2_size)
    counts = pres.sum(axis=1)
    m = node_codes.shape[0]
    cent = np.zeros((m, 3), dtype=np.float64)
    has_c = counts >= 3
    sums = np.where(pres[:, :, None], vw, 0.0).sum(axis=1)
    cent[has_c] = sums[has_c] / counts[has_c, None]
    if centroid_resid is not None:
        cent[has_c] += centroid_resid[has_c]
    return cent, has_c


def derive_face_vertices(node_codes: np.ndarray, present: np.ndarray,
                         vpos: np.ndarray, log2_size: int,
                         centroid_resid: np.ndarray = None):
    """Candidate face vertices with DERIVED positions (reference
    determineTrisoupFaceVertices, geometry_trisoup_encoder.cpp:931):
    where two face-adjacent nodes both have centroids, the candidate
    face vertex is the intersection of the centroid-connection segment
    with the shared face plane.  Only a connect flag is coded
    (encodeTrisoupFaceList codes one adaptive bit per candidate,
    :1070); the decoder re-derives the same candidates and positions
    from decoded vertices + drift.

    Returns (face_keys_unique, candidate (F,) bool, fpos (F,2))."""
    w = 1 << log2_size
    cent, has_c = _edge_centroids(node_codes, present, vpos,
                                  log2_size, centroid_resid)
    fkeys, origin = face_keys_for_nodes(node_codes, log2_size)
    uniq, inv = np.unique(fkeys.reshape(-1), return_inverse=True)
    nf = uniq.shape[0]
    m = node_codes.shape[0]
    flat_inv = inv
    node_of = np.repeat(np.arange(m), 6)
    order = np.argsort(flat_inv, kind="stable")
    fi = flat_inv[order]
    ni = node_of[order]
    dup = np.flatnonzero(np.concatenate([fi[1:] == fi[:-1], [False]]))
    fid, na_, nb_ = fi[dup], ni[dup], ni[dup + 1]
    ok = has_c[na_] & has_c[nb_]
    fid, na_, nb_ = fid[ok], na_[ok], nb_[ok]
    cand = np.zeros(nf, dtype=bool)
    fpos = np.zeros((nf, 2), dtype=np.int64)
    if fid.size == 0:
        return uniq, cand, fpos
    axis = ((uniq[fid] >> 60) - 4).astype(np.int64)
    swap = origin[na_, axis] > origin[nb_, axis]
    lo = np.where(swap, nb_, na_)
    hi = np.where(swap, na_, nb_)
    rows = np.arange(fid.size)
    plane = origin[hi, axis].astype(np.float64) - 0.5
    ca, cb = cent[lo], cent[hi]
    da = cb[rows, axis] - ca[rows, axis]
    safe = np.where(np.abs(da) > 1e-9, da, 1.0)
    t = np.clip((plane - ca[rows, axis]) / safe, 0.0, 1.0)
    pt = ca + t[:, None] * (cb - ca)
    p1 = np.array([_PERP[a][0] for a in range(3)])[axis]
    p2 = np.array([_PERP[a][1] for a in range(3)])[axis]
    c1 = np.clip(np.round(pt[rows, p1] - origin[lo, p1]), 0, w - 1)
    c2 = np.clip(np.round(pt[rows, p2] - origin[lo, p2]), 0, w - 1)
    cand[fid] = True
    fpos[fid, 0] = c1.astype(np.int64)
    fpos[fid, 1] = c2.astype(np.int64)
    return uniq, cand, fpos


def face_vertex_supported(points_codes_sorted: np.ndarray,
                          face_uniq: np.ndarray, cand: np.ndarray,
                          fpos: np.ndarray, log2_size: int):
    """Encoder presence rule: a candidate face vertex connects when
    original points sit within a 1-voxel Chebyshev shell of the
    derived position (the reference checks the original distribution
    around the temporary vertex, :964-967)."""
    w = 1 << log2_size
    nf = face_uniq.shape[0]
    rows = np.flatnonzero(cand)
    if rows.size == 0:
        return np.zeros(nf, dtype=bool)
    axis = ((face_uniq[rows] >> 60) - 4).astype(np.int64)
    corner = morton.decode(face_uniq[rows]
                           & ((np.int64(1) << 60) - 1))
    p1 = np.array([_PERP[a][0] for a in range(3)])[axis]
    p2 = np.array([_PERP[a][1] for a in range(3)])[axis]
    k = rows.size
    pos = corner.copy()
    r = np.arange(k)
    pos[r, p1] += fpos[rows, 0]
    pos[r, p2] += fpos[rows, 1]
    hit = np.zeros(k, dtype=bool)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                q = pos + np.array([dx, dy, dz])
                okq = (q >= 0).all(axis=1)
                codes = morton.encode(np.maximum(q, 0))
                j = np.searchsorted(points_codes_sorted, codes)
                j = np.minimum(j, points_codes_sorted.size - 1)
                hit |= okq & (points_codes_sorted[j] == codes)
    out = np.zeros(nf, dtype=bool)
    out[rows] = hit
    return out


def centroid_resid_with_faces(node_codes, present, vpos, log2_size,
                              resid, faces):
    """The drift is estimated against the edge-vertex mean, but the
    reconstruction fan centres on the with-faces mean; shift the
    residual so the fan centroid still lands at edge_mean + drift."""
    if faces is None:
        return resid
    vw_f, pres_f = _node_vertices(node_codes, present, vpos,
                                  log2_size, faces=faces)
    cnt_f = pres_f.sum(axis=1)
    sums_f = np.where(pres_f[:, :, None], vw_f, 0.0).sum(axis=1)
    ce, has_e = _edge_centroids(node_codes, present, vpos, log2_size)
    out = resid.astype(np.float64).copy()
    sel = cnt_f >= 3
    cf = np.zeros_like(ce)
    cf[sel] = sums_f[sel] / cnt_f[sel, None]
    adj = has_e & sel
    out[adj] += ce[adj] - cf[adj]
    return out


def determine_vertices(points: np.ndarray, node_codes: np.ndarray,
                       point_node_idx: np.ndarray, log2_size: int):
    """Encoder: per unique edge, presence + quantised position.

    points: (N,3) voxel coords; point_node_idx: (N,) index into
    node_codes of each point's node.  Returns (edge_keys_unique,
    present (E,) bool, vpos (E,) int in [0, 2**log2_size)).
    Adjacency rule: a voxel is adjacent to a node edge when both its
    perpendicular coordinates (node-local) are within 1 voxel of that
    edge's corner (reference vertex determination uses the same
    2-voxel shell, geometry_trisoup_encoder.cpp:336+).
    """
    w = 1 << log2_size
    keys, origin = edge_keys_for_nodes(node_codes, log2_size)
    uniq, inv = unique_edges(keys)
    ne = uniq.shape[0]
    counts = np.zeros(ne, dtype=np.int64)
    sums = np.zeros(ne, dtype=np.int64)
    local = points.astype(np.int64) - origin[point_node_idx]   # (N,3)
    for e in range(12):
        ax = _EDGE_AXIS[e]
        p1, p2 = _PERP[ax]
        c1 = _EDGE_C1[e] * (w - 1)
        c2 = _EDGE_C2[e] * (w - 1)
        near = ((np.abs(local[:, p1] - c1) <= 1)
                & (np.abs(local[:, p2] - c2) <= 1))
        eidx = inv[point_node_idx, e]
        np.add.at(counts, eidx[near], 1)
        np.add.at(sums, eidx[near], local[near, ax])
    present = counts > 0
    vpos = np.zeros(ne, dtype=np.int64)
    nz = present
    vpos[nz] = (sums[nz] + counts[nz] // 2) // counts[nz]
    np.clip(vpos, 0, w - 1, out=vpos)
    return uniq, present, vpos


def node_dominant_axis(node_codes: np.ndarray, edge_uniq: np.ndarray,
                       present: np.ndarray, vpos: np.ndarray,
                       log2_size: int, faces=None) -> np.ndarray:
    """Per-node dominant (surface-normal-like) axis: the axis of
    smallest vertex spread (reference findDominantAxis,
    geometry_trisoup.h:1301).  Computed from decoded vertices only, so
    the decoder derives the same axis for the 1-D centroid drift."""
    vw, pres = _node_vertices(node_codes, present, vpos, log2_size,
                              faces=faces)
    big = 1e18
    hi = np.where(pres[:, :, None], vw, -big).max(axis=1)
    lo = np.where(pres[:, :, None], vw, big).min(axis=1)
    return np.argmin(hi - lo, axis=1)


def _fan_triangles(verts: np.ndarray):
    """Order >=3 vertices around their dominant axis and fan them.

    Mirrors the reference's dominant-axis vertex ordering
    (geometry_trisoup.h:71-94, findDominantAxis :1301): project onto
    the plane perpendicular to the axis of largest extent, sort by
    angle, fan around the centroid.
    Returns (T,3,3) float triangle vertex array.
    """
    c = verts.mean(axis=0)
    spread = verts.max(axis=0) - verts.min(axis=0)
    dom = int(np.argmin(spread))        # surface ~ perpendicular plane
    axes = [a for a in range(3) if a != dom]
    ang = np.arctan2(verts[:, axes[1]] - c[axes[1]],
                     verts[:, axes[0]] - c[axes[0]])
    order = np.argsort(ang, kind="stable")
    v = verts[order]
    k = v.shape[0]
    tris = []
    for i in range(k):
        tris.append([v[i], v[(i + 1) % k], c])
    return np.asarray(tris)


def _raster_triangles(tris: np.ndarray, eps: float,
                      max_extent: int = 40):
    """Axis-aligned ray rasterisation of triangles -> voxel coords.

    Counterpart of the reference's rayTracingAlongdirection
    (geometry_trisoup_decoder.cpp): for each triangle, integer rays
    along the axis of largest normal component; the depth comes from
    the plane equation, so every covered (u,v) column yields exactly
    one voxel — no over/under-sampling like barycentric grids.  eps:
    edge tolerance in pixels (the reference's haloTriangle margin).

    Returns (P,3) int voxels with the owning triangle index (P,).
    """
    t = tris.astype(np.float64)
    e1 = t[:, 1] - t[:, 0]
    e2 = t[:, 2] - t[:, 0]
    nrm = np.cross(e1, e2)
    ax = np.argmax(np.abs(nrm), axis=1)
    out_pts = []
    out_ids = []
    for a in range(3):
        sel = np.flatnonzero(ax == a)
        if sel.size == 0:
            continue
        a1, a2 = [b for b in range(3) if b != a]
        v2 = t[sel][:, :, [a1, a2]]              # (G,3,2)
        na = nrm[sel, a]
        ok = np.abs(na) > 1e-9
        sel, v2, na = sel[ok], v2[ok], na[ok]
        if sel.size == 0:
            continue
        # plane: nrm . x = nrm . V0
        n1 = nrm[sel, a1]
        n2 = nrm[sel, a2]
        d0 = (nrm[sel] * t[sel, 0]).sum(axis=1)
        # orient edges consistently (positive area in (a1,a2))
        area = ((v2[:, 1, 0] - v2[:, 0, 0])
                * (v2[:, 2, 1] - v2[:, 0, 1])
                - (v2[:, 1, 1] - v2[:, 0, 1])
                * (v2[:, 2, 0] - v2[:, 0, 0]))
        flip = area < 0
        v2[flip] = v2[flip][:, ::-1, :]
        bbmin = np.ceil(v2.min(axis=1) - eps).astype(np.int64)
        bbmax = np.floor(v2.max(axis=1) + eps).astype(np.int64)
        ext = np.maximum(bbmax - bbmin + 1, 0)
        np.clip(ext, 0, max_extent, out=ext)
        max_u = int(ext[:, 0].max()) if ext.size else 0
        max_v = int(ext[:, 1].max()) if ext.size else 0
        # per-edge normalised inward distance coefficients
        ea = np.roll(v2, -1, axis=1) - v2        # (G,3,2)
        elen = np.maximum(np.hypot(ea[:, :, 0], ea[:, :, 1]), 1e-9)
        # fully vectorised (triangle, column) grid, chunked over
        # triangles to bound the (Gc, U*V) temporaries
        K = max(max_u * max_v, 1)
        du = (np.arange(K) // max(max_v, 1)).astype(np.int64)
        dv = (np.arange(K) % max(max_v, 1)).astype(np.int64)
        gchunk = max((1 << 22) // K, 256)
        for g0 in range(0, sel.size, gchunk):
            sl = slice(g0, min(g0 + gchunk, sel.size))
            pu = bbmin[sl, 0][:, None] + du[None, :]      # (Gc,K)
            pv = bbmin[sl, 1][:, None] + dv[None, :]
            inside = (pu <= bbmax[sl, 0][:, None]) \
                & (pv <= bbmax[sl, 1][:, None])
            px = pu.astype(np.float64)
            py = pv.astype(np.float64)
            for e in range(3):
                cr = (ea[sl, e, 0][:, None]
                      * (py - v2[sl, e, 1][:, None])
                      - ea[sl, e, 1][:, None]
                      * (px - v2[sl, e, 0][:, None]))
                inside &= cr >= (-eps) * elen[sl, e][:, None]
            gi, ki = np.nonzero(inside)
            if gi.size == 0:
                continue
            pxg = px[gi, ki]
            pyg = py[gi, ki]
            depth = (d0[sl][gi] - n1[sl][gi] * pxg
                     - n2[sl][gi] * pyg) / na[sl][gi]
            pts = np.empty((gi.size, 3), dtype=np.int64)
            pts[:, a] = np.round(depth).astype(np.int64)
            pts[:, a1] = pu[gi, ki]
            pts[:, a2] = pv[gi, ki]
            out_pts.append(pts)
            out_ids.append(sel[sl][gi])
    if not out_pts:
        return (np.zeros((0, 3), dtype=np.int64),
                np.zeros(0, dtype=np.int64))
    return np.concatenate(out_pts), np.concatenate(out_ids)


def _sample_triangles(tris: np.ndarray, samples: int):
    """Barycentric SxS sampling of triangles -> voxel coords (T,S',3).

    float32 math, keeps the (T, S', 3) shape so callers can clip per
    triangle; S' = number of in-triangle barycentric samples.
    """
    s = samples
    a = np.linspace(0.0, 1.0, s, dtype=np.float32)
    u, v = np.meshgrid(a, a)
    mask = (u + v) <= 1.0
    u = u[mask]
    v = v[mask]
    w = 1.0 - u - v
    t32 = tris.astype(np.float32)
    pts = (t32[:, None, 0, :] * u[None, :, None]
           + t32[:, None, 1, :] * v[None, :, None]
           + t32[:, None, 2, :] * w[None, :, None])
    return np.round(pts).astype(np.int64)


def _unique_codes(pts: np.ndarray) -> np.ndarray:
    """Sorted unique Morton codes of (P,3) voxels (native fast path)."""
    if pts.shape[0] == 0:
        return np.zeros(0, dtype=np.int64)
    from ..bitstream import entropy
    codes, _ = entropy.morton_sort(pts, return_perm=False)
    keep = np.empty(codes.shape, dtype=bool)
    keep[0] = True
    np.not_equal(codes[1:], codes[:-1], out=keep[1:])
    return codes[keep]


def _node_vertices(node_codes, present, vpos, log2_size,
                   faces=None):
    """Combined per-node vertex table: 12 edge slots + 6 face slots.

    faces: optional (face_present (F,), fpos (F,2)).  Returns
    (vw (M,18,3) float64 world positions, pres (M,18) bool)."""
    w = 1 << log2_size
    keys, origin = edge_keys_for_nodes(node_codes, log2_size)
    _, inv = unique_edges(keys)
    m = node_codes.shape[0]
    vw = np.zeros((m, 18, 3), dtype=np.float64)
    pres = np.zeros((m, 18), dtype=bool)
    pres[:, :12] = present[inv]
    for e in range(12):
        ax = _EDGE_AXIS[e]
        p1, p2 = _PERP[ax]
        vw[:, e, :] = origin
        vw[:, e, p1] += _EDGE_C1[e] * (w - 1)
        vw[:, e, p2] += _EDGE_C2[e] * (w - 1)
        vw[:, e, ax] += vpos[inv[:, e]]
    if faces is not None:
        f_present, fpos = faces
        fkeys, _ = face_keys_for_nodes(node_codes, log2_size)
        _, finv = np.unique(fkeys.reshape(-1), return_inverse=True)
        finv = finv.reshape(fkeys.shape)
        pres[:, 12:] = f_present[finv]
        for f in range(6):
            a, side = f // 2, f % 2
            p1, p2 = _PERP[a]
            s = 12 + f
            vw[:, s, :] = origin
            vw[:, s, a] += side * (w - 1)
            vw[:, s, p1] += fpos[finv[:, f], 0]
            vw[:, s, p2] += fpos[finv[:, f], 1]
    return vw, pres


def vertex_counts(node_codes: np.ndarray, edge_uniq: np.ndarray,
                  present: np.ndarray, log2_size: int,
                  faces=None) -> np.ndarray:
    """Number of present vertices per node (decoder-derivable)."""
    zeros = np.zeros(present.shape[0], dtype=np.int64)
    _, pres = _node_vertices(node_codes, present, zeros, log2_size,
                             faces=faces)
    return pres.sum(axis=1)


def true_centroid_residuals(points: np.ndarray, node_codes: np.ndarray,
                            point_node_idx: np.ndarray,
                            edge_uniq: np.ndarray, present: np.ndarray,
                            vpos: np.ndarray, log2_size: int,
                            faces=None):
    """Encoder: per >=3-vertex node, the residual between the node's
    true point centroid and the vertex-mean centroid (reference
    determineTrisoupCentroids, geometry_trisoup_encoder.cpp:800).
    Returns (M,3) int residuals (zero where <3 vertices)."""
    w = 1 << log2_size
    m = node_codes.shape[0]
    _, origin = edge_keys_for_nodes(node_codes, log2_size)
    vw, pres = _node_vertices(node_codes, present, vpos, log2_size,
                              faces=faces)
    counts = pres.sum(axis=1)
    vsum = np.where(pres[:, :, None], vw, 0.0).sum(axis=1)
    cent_v = vsum / np.maximum(counts, 1)[:, None]
    # true point centroid per node
    psum = np.zeros((m, 3), dtype=np.int64)
    np.add.at(psum, point_node_idx, points.astype(np.int64))
    pcnt = np.bincount(point_node_idx, minlength=m)
    cent_p = psum / np.maximum(pcnt, 1)[:, None]
    resid = np.round(cent_p - cent_v).astype(np.int64)
    half = w  # clamp to one node width
    np.clip(resid, -half, half, out=resid)
    resid[counts < 3] = 0
    return resid


def reconstruct(node_codes: np.ndarray, edge_uniq: np.ndarray,
                present: np.ndarray, vpos: np.ndarray, log2_size: int,
                bbox_max=None, centroid_resid: np.ndarray = None,
                faces=None, halo: bool = False):
    """Shared encoder/decoder reconstruction: vertices -> voxels.

    Vectorised: nodes are grouped by (vertex count, dominant axis) and
    each group's angle sort, triangle fan, and barycentric sampling run
    as one batch.  centroid_resid (M,3) shifts each node's fan centroid
    (reference centroid vertex residual); faces adds interior face
    vertices to the fans.  Returns sorted unique (P,3) voxel positions.
    """
    w = 1 << log2_size
    _, origin = edge_keys_for_nodes(node_codes, log2_size)
    m = node_codes.shape[0]
    samples = 2 * w + 1

    vw, pres = _node_vertices(node_codes, present, vpos, log2_size,
                              faces=faces)
    counts = pres.sum(axis=1)

    out = []
    # 1-2 vertices: emit the vertex voxels directly
    few = (counts >= 1) & (counts < 3)
    if few.any():
        sel = pres & few[:, None]
        out.append(_unique_codes(np.round(vw[sel]).astype(np.int64)))

    # >=3 vertices: group by count k, sub-group by dominant axis
    for k in range(3, 19):
        nk = np.nonzero(counts == k)[0]
        if nk.size == 0:
            continue
        # gather each node's k vertices in edge order: (Nk, k, 3)
        rows = pres[nk]
        verts = vw[nk][rows].reshape(nk.size, k, 3)
        cent = verts.mean(axis=1)                    # (Nk,3)
        if centroid_resid is not None:
            cent = cent + centroid_resid[nk]
        spread = verts.max(axis=1) - verts.min(axis=1)
        dom = np.argmin(spread, axis=1)              # (Nk,)
        if halo:
            # thicken triangles (reference trisoup_halo_flag,
            # rayTracingAlongdirection haloTriangle margin): expand
            # the fan 0.75 voxels outward from its centroid so
            # voxelised triangles of adjacent nodes seal together
            d = np.abs(verts - cent[:, None, :]).max(axis=(1, 2))
            scale = np.minimum(1.0 + 0.75 / np.maximum(d, 1.0),
                               1.5)[:, None, None]
            verts = cent[:, None, :] + (verts - cent[:, None, :]) \
                * scale
        for ax in range(3):
            ga = np.nonzero(dom == ax)[0]
            if ga.size == 0:
                continue
            v = verts[ga]                            # (G,k,3)
            c = cent[ga]
            a1, a2 = [a for a in range(3) if a != ax]
            ang = np.arctan2(v[:, :, a2] - c[:, None, a2],
                             v[:, :, a1] - c[:, None, a1])
            order = np.argsort(ang, kind="stable", axis=1)
            vs = np.take_along_axis(v, order[:, :, None], axis=1)
            nxt = np.roll(vs, -1, axis=1)
            # triangles (G, k, 3 verts, 3): (v_i, v_{i+1}, centroid)
            tris = np.stack(
                [vs, nxt, np.broadcast_to(c[:, None, :], vs.shape)],
                axis=2).reshape(-1, 3, 3)
            node_ids = nk[ga]
            per_tri = np.repeat(node_ids, k)
            # axis-aligned ray rasterisation (one voxel per covered
            # column); halo widens the edge tolerance so triangles of
            # adjacent nodes seal together
            eps = 0.75 if halo else 0.4
            chunk = 1 << 14
            for c0 in range(0, tris.shape[0], chunk):
                spt, tid = _raster_triangles(tris[c0:c0 + chunk], eps)
                if spt.shape[0] == 0:
                    continue
                ids = per_tri[c0:c0 + chunk][tid]
                lo = origin[ids]
                hi = lo + (w - 1)
                keep = np.all((spt >= lo) & (spt <= hi), axis=1)
                out.append(_unique_codes(spt[keep]))
            # vertices themselves always emit (thin-triangle safety,
            # mirrors the reference's vertex voxel emission), clipped
            # to their node box
            vpts = np.round(verts[ga]).astype(np.int64)   # (G,k,3)
            vlo = origin[nk[ga]][:, None, :]
            vhi = vlo + (w - 1)
            vkeep = np.all((vpts >= vlo) & (vpts <= vhi), axis=2)
            out.append(_unique_codes(vpts[vkeep]))
    if not out:
        return np.zeros((0, 3), dtype=np.int64)
    codes = np.unique(np.concatenate(out))
    pts = morton.decode(codes)
    if bbox_max is not None:
        keep = np.all((pts >= 0) & (pts <= np.asarray(bbox_max)), axis=1)
        pts = pts[keep]
    return pts
