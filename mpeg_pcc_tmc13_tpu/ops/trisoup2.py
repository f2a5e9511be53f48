"""Trisoup v2: reference-fidelity surface model, vectorised.

Round-3 rework of the trisoup surface reconstruction to match the
reference's geometry (the round-2 port was ~1 dB D1 short):

* edge vertices live on the INFLATED node cube [-0.5, W-0.5]^3 in
  s7.8 fixed point, at integer voxel centres along the edge
  (processTrisoupVertices, geometry_trisoup_encoder.cpp:755-781);
* two-window voxel voting decides presence (count>0 || count2>1) and
  the vertex position is the fixed-point blend of both windows
  (geometry_trisoup_encoder.cpp:492-705);
* vertices are ordered by the pseudo-arc score around the dominant
  axis (max summed |normal|), decreasing, ties by increasing height
  (findDominantAxis, geometry_trisoup_decoder.cpp:1301-1352);
* the node centroid is the L1-segment-weighted vertex mean, refined
  by a quantised drift along the integer surface normal
  (determineNormVandCentroidContexts :562, determineTrisoupCentroids
  geometry_trisoup_encoder.cpp:800-925);
* reconstruction rasterises each triangle by integer Moller-Trumbore
  rays along the two non-parallel axes, emitting the intersection
  voxel and its +-thickness neighbours, with the fine-ray fallback
  and the automatic sampling loop that stops once the count fits the
  signalled point budget (decodeTrisoupCommon :675,
  rayTracingAlongdirection :1357).

Everything is batched array code (k-vertex node groups, flat ray
tensors); only the entropy coding of presence/position/drift stays on
the host coder.
"""

from __future__ import annotations

import numpy as np

from ..utils import morton
from .trisoup import (_EDGE_AXIS, _EDGE_C1, _EDGE_C2, _PERP,
                      edge_keys_for_nodes, unique_edges)

FP = 8
FPONE = 1 << FP
FPHALF = 1 << (FP - 1)

# findDominantAxis projection index pairs (s[sIdx1], s[sIdx2])
_SIDX1 = (2, 2, 1)
_SIDX2 = (1, 0, 0)

# rayTracingAlongdirection grid axes per ray direction
_G1POS = (1, 0, 0)
_G2POS = (2, 2, 1)


def _cdiv(a, b):
    """C-style truncating integer division (toward zero)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    q = np.abs(a) // np.abs(b)
    return np.where((a >= 0) == (b >= 0), q, -q)


def _isqrt(x):
    """floor(sqrt(x)) for int64 inputs comfortably below 2**52."""
    s = np.sqrt(x.astype(np.float64)).astype(np.int64)
    s = np.where((s + 1) * (s + 1) <= x, s + 1, s)
    s = np.where(s * s > x, s - 1, s)
    return s


def _cross(a, b):
    return np.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]], axis=-1)


def distance_search(num_nodes: int, num_points: int, w: int) -> int:
    """Encoder distance-search window (improvedVertexDetermination,
    geometry_trisoup_encoder.cpp:134-146; bitDropped = 0)."""
    est = max(1.0, np.sqrt(num_nodes / max(1, num_points)) * w)
    return int(max(1, min(8, int(np.round(est + 0.1)))))


def determine_vertices(points: np.ndarray, node_codes: np.ndarray,
                       point_node_idx: np.ndarray, log2_size: int,
                       dse: int):
    """Two-window vertex voting (geometry_trisoup_encoder.cpp:492-705).

    Window 1 counts voxels exactly on the edge line; window 2 uses the
    distance-search shell.  present = count>0 || count2>1; position is
    the 2:1 fixed-point blend of the two window means.
    """
    w = 1 << log2_size
    keys, origin = edge_keys_for_nodes(node_codes, log2_size)
    uniq, inv = unique_edges(keys)
    ne = uniq.shape[0]
    c1 = np.zeros(ne, dtype=np.int64)
    d1 = np.zeros(ne, dtype=np.int64)
    c2 = np.zeros(ne, dtype=np.int64)
    d2 = np.zeros(ne, dtype=np.int64)
    local = points.astype(np.int64) - origin[point_node_idx]
    tmax1 = w - 2
    tmax2 = w - dse - 1
    for e in range(12):
        ax = _EDGE_AXIS[e]
        p1, p2 = _PERP[ax]
        lo1 = (local[:, p1] < 1) if _EDGE_C1[e] == 0 \
            else (local[:, p1] > tmax1)
        lo2 = (local[:, p2] < 1) if _EDGE_C2[e] == 0 \
            else (local[:, p2] > tmax1)
        near1 = lo1 & lo2
        wl1 = (local[:, p1] < dse) if _EDGE_C1[e] == 0 \
            else (local[:, p1] > tmax2)
        wl2 = (local[:, p2] < dse) if _EDGE_C2[e] == 0 \
            else (local[:, p2] > tmax2)
        near2 = wl1 & wl2
        eidx = inv[point_node_idx, e]
        np.add.at(c1, eidx[near1], 1)
        np.add.at(d1, eidx[near1], local[near1, ax])
        np.add.at(c2, eidx[near2], 1)
        np.add.at(d2, eidx[near2], local[near2, ax])
    present = (c1 > 0) | (c2 > 1)
    vpos = np.zeros(ne, dtype=np.int64)
    nz = present
    temp = ((2 * d1[nz] + d2[nz]) << 10) // (2 * c1[nz] + c2[nz])
    vpos[nz] = (temp + (1 << 9)) >> 10
    np.clip(vpos, 0, w - 1, out=vpos)
    return uniq, present, vpos


def node_vertices_fp(node_codes: np.ndarray, uniq: np.ndarray,
                     present: np.ndarray, vpos: np.ndarray,
                     log2_size: int):
    """Per node: fixed-point vertices on the inflated cube, edge
    order.  Returns (verts (M,12,3) int64 fp, mask (M,12))."""
    w = 1 << log2_size
    keys, _ = edge_keys_for_nodes(node_codes, log2_size)
    _, inv = unique_edges(keys)
    m = node_codes.shape[0]
    pres = present[inv]
    v = vpos[inv]
    verts = np.zeros((m, 12, 3), dtype=np.int64)
    for e in range(12):
        ax = _EDGE_AXIS[e]
        p1, p2 = _PERP[ax]
        verts[:, e, ax] = v[:, e] << FP
        verts[:, e, p1] = -FPHALF if _EDGE_C1[e] == 0 \
            else (w << FP) - FPHALF
        verts[:, e, p2] = -FPHALF if _EDGE_C2[e] == 0 \
            else (w << FP) - FPHALF
    return verts, pres


def _arc(sx, sy, wx, wy):
    """trisoupVertexArc pseudo-angle (decoder :467)."""
    return np.where(
        sx >= wx, sy,
        np.where(sy >= wy, wy + wx - sx,
                 np.where(sx <= 0, wy * 2 + wx - sy,
                          wy * 2 + wx + sx)))


class NodeSurface:
    """Ordered per-node surface state (ragged by vertex count)."""

    def __init__(self, m):
        self.counts = np.zeros(m, dtype=np.int64)
        self.order_rows = [None] * 13   # per-k node index arrays
        self.order_verts = [None] * 13  # per-k (G,k,3) sorted verts
        self.gravity = np.zeros((m, 3), dtype=np.int64)
        self.normal = np.zeros((m, 3), dtype=np.int64)
        self.drift_ok = np.zeros(m, dtype=bool)
        self.low_bound = np.zeros(m, dtype=np.int64)
        self.high_bound = np.zeros(m, dtype=np.int64)
        self.cpos = np.zeros((m, 3), dtype=np.int64)
        self.cvalid = np.zeros(m, dtype=bool)


def build_surface(verts: np.ndarray, mask: np.ndarray,
                  log2_size: int) -> NodeSurface:
    """Ordering + weighted centroid + normal + drift bounds for every
    node (vectorised per vertex-count group)."""
    w = 1 << log2_size
    wfp = w << FP
    m = verts.shape[0]
    ns = NodeSurface(m)
    ns.counts = mask.sum(axis=1)

    for k in range(3, 13):
        rows = np.nonzero(ns.counts == k)[0]
        if rows.size == 0:
            continue
        sel = mask[rows]
        V = verts[rows][sel].reshape(rows.size, k, 3)

        if k > 3:
            gmean = _cdiv(V.sum(axis=1), k)
            s_ = V + FPHALF
            best_acc = np.zeros(rows.size, dtype=np.int64)
            best_axis = np.zeros(rows.size, dtype=np.int64)
            best_order = np.zeros((rows.size, k), dtype=np.int64)
            for ax in range(3):
                theta = _arc(s_[:, :, _SIDX1[ax]], s_[:, :, _SIDX2[ax]],
                             wfp, wfp)
                tie = s_[:, :, ax]
                key = -theta * (1 << 14) + tie
                order = np.argsort(key, axis=1, kind="stable")
                Vs = np.take_along_axis(V, order[:, :, None], axis=1)
                d = Vs - gmean[:, None, :]
                cr = _cross(d, np.roll(d, -1, axis=1))
                acc = np.abs(cr[:, :, ax]).sum(axis=1)
                better = acc > best_acc
                best_acc = np.where(better, acc, best_acc)
                best_axis = np.where(better, ax, best_axis)
                best_order = np.where(better[:, None], order, best_order)
            V = np.take_along_axis(V, best_order[:, :, None], axis=1)

        # L1-segment-weighted centroid (cyclic, sorted order)
        seg = np.abs(V - np.roll(V, -1, axis=1)).sum(axis=2)  # (G,k)
        wgt = seg + np.roll(seg, 1, axis=1)
        wtot = wgt.sum(axis=1)
        num = (wgt[:, :, None] * V).sum(axis=1)
        gravity = _cdiv(num, np.maximum(wtot, 1)[:, None])
        ns.gravity[rows] = gravity
        ns.order_rows[k] = rows
        ns.order_verts[k] = V
        ns.cpos[rows] = gravity
        ns.cvalid[rows] = True

        if k > 3:
            d = V - gravity[:, None, :]
            accn = _cross(d, np.roll(d, -1, axis=1)).sum(axis=1)
            normn = _isqrt((accn * accn).sum(axis=1))
            ok = normn > 0
            normal = np.zeros_like(accn)
            normal[ok] = _cdiv(accn[ok] << FP, normn[ok, None])
            ns.normal[rows] = normal
            ns.drift_ok[rows] = ok

            # drift bounds: march along +-normal until outside
            # [0, (w-1)<<FP]^3 (determineNormVandCentroidContexts)
            bound = (w - 1) << FP
            for sign, attr in ((1, "high_bound"), (-1, "low_bound")):
                bnd = np.full(rows.size, w - 1, dtype=np.int64)
                alive = ok.copy()
                for mm in range(1, w):
                    t = gravity + sign * mm * normal
                    out = ((t < 0) | (t > bound)).any(axis=1)
                    firstout = alive & out
                    bnd[firstout] = mm - 1
                    alive = alive & ~out
                getattr(ns, attr)[rows] = bnd
    return ns


def determine_drift(points: np.ndarray, point_node_idx: np.ndarray,
                    origin: np.ndarray, ns: NodeSurface,
                    log2_size: int):
    """Encoder: quantised centroid drift along the node normal
    (determineTrisoupCentroids, geometry_trisoup_encoder.cpp:852-898).
    Returns driftQ (M,) int64 (0 where not applicable)."""
    m = ns.gravity.shape[0]
    counter = np.zeros(m, dtype=np.int64)
    acc = np.zeros(m, dtype=np.int64)
    ok = ns.drift_ok
    pok = ok[point_node_idx]
    if pok.any():
        pn = point_node_idx[pok]
        pt = (points[pok].astype(np.int64)
              - origin[pn]) << FP
        nrm = ns.normal[pn]
        g = ns.gravity[pn]
        rel = pt - g
        cp = _cross(nrm[None, :, :] if nrm.ndim == 1 else nrm,
                    rel) >> FP
        dist = _isqrt((cp * cp).sum(axis=1)) >> FP
        maxd = 3
        inl = (dist << 10) <= 1774 * maxd
        wq = (1 << 10) + 4 * (1774 * maxd - (dist << 10))
        wq = wq >> 10
        proj = (nrm * rel).sum(axis=1) >> FP
        np.add.at(counter, pn[inl], wq[inl])
        np.add.at(acc, pn[inl], (wq * proj)[inl])
    drift = np.zeros(m, dtype=np.int64)
    nz = counter > 0
    drift[nz] = _cdiv(acc[nz] >> (FP - 6), counter[nz])
    half = 1 << 5
    dz = 2 * half // 3
    driftq = np.zeros(m, dtype=np.int64)
    big = np.abs(drift) >= dz
    driftq[big] = (np.abs(drift[big]) - dz + 2 * half
                   + 2 * half // 3) >> 6
    driftq[big] *= np.sign(drift[big])
    driftq = np.minimum(np.maximum(driftq, -ns.low_bound),
                        ns.high_bound)
    driftq[~ok] = 0
    return driftq


def apply_drift(ns: NodeSurface, driftq: np.ndarray, log2_size: int):
    """Dequantise and apply the drift; clamp the centroid
    (determineTrisoupCentroids :893-915).  Mutates ns.cpos."""
    w = 1 << log2_size
    half = 1 << 5
    dz = 2 * half // 3
    dq = np.abs(driftq) << 6
    nz = driftq != 0
    dq[nz] += dz - half
    dq = dq * np.sign(driftq)
    ok = ns.drift_ok
    ns.cpos[ok] = ns.gravity[ok] + ((dq[ok, None] * ns.normal[ok]) >> 6)
    lo = -FPHALF
    hi = ((w - 1) << FP) + FPHALF - 1
    np.clip(ns.cpos, lo, hi, out=ns.cpos)


def _emit_rays(tris, tri_node, tri_w, origin, sampling, halo,
               thickness, fine_ray):
    """Integer Moller-Trumbore rasterisation of a flat triangle array.

    tris: (T,3,3) int64 fp vertices (node-local); tri_node: (T,) node
    row; tri_w: scalar node width.  Returns (P,3) GLOBAL voxel
    coords."""
    w = tri_w
    out = []
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    h3 = _cross(e1, e2) >> FP
    excl = np.argmin(np.abs(h3), axis=1)

    for d in range(3):
        use = excl != d
        if not use.any():
            continue
        t_idx = np.nonzero(use)[0]
        E1 = e1[t_idx]
        E2 = e2[t_idx]
        V0 = tris[t_idx, 0]
        # h = cross(rayVector, edge2) >> FP with rayVector = e_d << FP
        rv = np.zeros(3, dtype=np.int64)
        rv[d] = FPONE
        h = _cross(np.broadcast_to(rv, E2.shape), E2) >> FP
        a = (E1 * h).sum(axis=1) >> FP
        good = np.abs(a) > FPONE
        if not good.any():
            continue
        t_idx = t_idx[good]
        E1, E2, V0, h, a = E1[good], E2[good], V0[good], h[good], a[good]
        tv = tris[t_idx]
        mn = np.maximum(0, (tv.min(axis=1) + FPHALF) >> FP)
        mx = np.minimum(w, (tv.max(axis=1) + FPHALF) >> FP)
        g1a, g2a = _G1POS[d], _G2POS[d]
        n1 = (mx[:, g1a] - mn[:, g1a]) // sampling + 1
        n2 = (mx[:, g2a] - mn[:, g2a]) // sampling + 1
        nray = n1 * n2
        tot = int(nray.sum())
        if tot == 0:
            continue
        rid = np.repeat(np.arange(t_idx.size), nray)
        offs = np.concatenate([[0], np.cumsum(nray)[:-1]])
        rloc = np.arange(tot) - offs[rid]
        i1 = rloc // n2[rid]
        i2 = rloc - i1 * n2[rid]
        ro = np.zeros((tot, 3), dtype=np.int64)
        ro[:, d] = mn[rid, d] << FP
        ro[:, g1a] = (mn[rid, g1a] + i1 * sampling) << FP
        ro[:, g2a] = (mn[rid, g2a] + i2 * sampling) << FP

        def intersect(ro_):
            s = ro_ - V0[rid]
            u = _cdiv((s * h[rid]).sum(axis=1), a[rid])
            q = _cross(s, E1[rid])
            v = _cdiv(q[:, d], a[rid])
            wb = FPONE - u - v
            t = _cdiv((E2[rid] * (q >> FP)).sum(axis=1), a[rid])
            inter = ro_.copy()
            inter[:, d] += t
            hit = (u >= -halo) & (v >= -halo) & (wb >= -halo)
            return hit, inter

        hit, inter = intersect(ro)
        node_rows = tri_node[t_idx][rid]

        def emit(pts, selmask):
            vox = (pts + FPHALF) >> FP
            ok = selmask & np.all((vox >= 0) & (vox <= w - 1), axis=1)
            if ok.any():
                out.append(vox[ok] + origin[node_rows[ok]])
            return ok

        up = inter.copy()
        up[:, d] += thickness
        dn = inter.copy()
        dn[:, d] -= thickness
        emit(up, hit)
        emit(dn, hit)
        center_ok = emit(inter, hit)

        if sampling == 1 and fine_ray:
            # fine rays for rays that failed (or whose centre voxel
            # fell outside): 8 sub-voxel origin offsets, first hit
            # wins (rayTracingAlongdirection :1445-1468)
            retry = ~(hit & center_ok)
            if retry.any():
                roff1 = np.array([0, 0, -1, 1, -1, -1, 1, 1])
                roff2 = np.array([-1, 1, 0, 0, -1, 1, -1, 1])
                offq = FPHALF >> 2
                done = np.zeros(tot, dtype=bool)
                for p in range(8):
                    act = retry & ~done
                    if not act.any():
                        break
                    ro2 = ro.copy()
                    ro2[:, g1a] += int(roff1[p]) * offq
                    ro2[:, g2a] += int(roff2[p]) * offq
                    h2, it2 = intersect(ro2)
                    got = emit(it2, h2 & act)
                    done = done | (h2 & act & got)
    if not out:
        return np.zeros((0, 3), dtype=np.int64)
    return np.concatenate(out)


def reconstruct(node_codes: np.ndarray, uniq: np.ndarray,
                present: np.ndarray, vpos: np.ndarray, log2_size: int,
                driftq: np.ndarray, target_points: int,
                halo_flag: bool = True, adaptive_halo: bool = True,
                fine_ray: bool = True, bbox_max=None):
    """Full surface reconstruction with the automatic sampling loop
    (geometry_trisoup_encoder.cpp:210-237): voxelise at sampling 1, 2,
    ... until the count fits the signalled budget."""
    w = 1 << log2_size
    verts, mask = node_vertices_fp(node_codes, uniq, present, vpos,
                                   log2_size)
    ns = build_surface(verts, mask, log2_size)
    apply_drift(ns, driftq, log2_size)
    _, origin = edge_keys_for_nodes(node_codes, log2_size)

    best = None
    for sampling in range(1, w + 1):
        pts = _reconstruct_at(ns, verts, mask, origin, log2_size,
                              sampling, halo_flag, adaptive_halo,
                              fine_ray)
        best = pts
        if pts.shape[0] <= target_points:
            break
    pts = best
    if bbox_max is not None:
        keep = np.all((pts >= 0) & (pts <= np.asarray(bbox_max)),
                      axis=1)
        pts = pts[keep]
    codes = np.unique(morton.encode(pts))
    return morton.decode(codes)


def _reconstruct_at(ns: NodeSurface, verts, mask, origin, log2_size,
                    sampling, halo_flag, adaptive_halo, fine_ray):
    w = 1 << log2_size
    halo = 0
    if halo_flag and sampling > 1:
        halo = min(100, (50 * sampling) if adaptive_halo else 50)
    thickness = 16 if sampling > 1 else 32
    out = []

    # vertex voxels (only when subsampling; bitDropped == 0 here)
    if sampling > 1:
        vv = (verts + FPHALF) >> FP
        ok = mask & np.all((vv >= 0) & (vv <= w - 1), axis=2)
        rows, cols = np.nonzero(ok)
        if rows.size:
            out.append(vv[rows, cols] + origin[rows])

    # centroid voxels for >3-vertex nodes
    many = ns.counts > 3
    if many.any():
        cv = (ns.cpos[many] + FPHALF) >> FP
        ok = np.all((cv >= 0) & (cv <= w - 1), axis=1)
        if ok.any():
            out.append(cv[ok] + origin[np.nonzero(many)[0][ok]])

    # triangles
    for k in range(3, 13):
        rows = ns.order_rows[k]
        if rows is None or rows.size == 0:
            continue
        V = ns.order_verts[k]
        if k == 3:
            tris = V                      # (G,3,3): single triangle
            tri_node = rows
        else:
            c = ns.cpos[rows]
            vs = V
            nxt = np.roll(vs, -1, axis=1)
            tris = np.stack(
                [vs, nxt,
                 np.broadcast_to(c[:, None, :], vs.shape)],
                axis=2).reshape(-1, 3, 3)
            tri_node = np.repeat(rows, k)
        pts = _emit_rays(tris, tri_node, w, origin, sampling, halo,
                         thickness, fine_ray)
        if pts.shape[0]:
            out.append(pts)
    if not out:
        return np.zeros((0, 3), dtype=np.int64)
    allp = np.concatenate(out)
    codes = np.unique(morton.encode(allp))
    return morton.decode(codes)


# ---------------------------------------------------------------------------
# edge-coder conditioning features (v2 vertex coder).  The conditioning
# variables mirror the reference's decodeTrisoupVerticesSub
# (geometry_trisoup_decoder.cpp:1080-1260): 9 geometric neighbour edges
# (the colinear predecessor + the 8 perpendicular edges touching the
# two end corners) with vertex-closeness orientation, plus the
# containing/flanking node multiplicities.  Everything derives from the
# node set only, so encoder and decoder compute identical features.
# ---------------------------------------------------------------------------

_P1 = np.array([1, 0, 0])
_P2 = np.array([2, 2, 1])


def edge_coder_features(node_codes: np.ndarray, uniq: np.ndarray,
                        log2_size: int):
    """Returns (order, nbr (E,9) int32, orient (E,) u16, cmult,
    nbefore, nafter, direction) for the v2 vertex coder."""
    w = 1 << log2_size
    ne = uniq.shape[0]
    axis = (uniq >> 60).astype(np.int64)
    mort = uniq & ((np.int64(1) << 60) - 1)
    start = morton.decode(mort)
    order = np.lexsort((axis, mort)).astype(np.int64)
    rank = np.empty(ne, dtype=np.int64)
    rank[order] = np.arange(ne)

    from .trisoup import edge_keys_for_nodes
    keys, _ = edge_keys_for_nodes(node_codes, log2_size)
    flat = np.sort(keys.reshape(-1))

    def mult_of(karr, valid):
        lo = np.searchsorted(flat, karr, "left")
        hi = np.searchsorted(flat, karr, "right")
        return np.where(valid, hi - lo, 0)

    def key_of(coords, ax):
        valid = (coords >= 0).all(axis=1)
        cc = np.maximum(coords, 0)
        return morton.encode(cc) + (np.asarray(ax, dtype=np.int64)
                                    << 60), valid

    def lookup(karr, valid, self_rank):
        idx = np.searchsorted(uniq, karr)
        idx = np.minimum(idx, ne - 1)
        found = (uniq[idx] == karr) & valid
        found &= rank[idx] < self_rank
        return np.where(found, idx, -1).astype(np.int32)

    e_d = np.zeros((ne, 3), dtype=np.int64)
    e_d[np.arange(ne), axis] = w

    kb, vb = key_of(start - e_d, axis)
    ka, va = key_of(start + e_d, axis)
    cmult = mult_of(uniq, np.ones(ne, bool)).astype(np.uint8)
    nbefore = mult_of(kb, vb).astype(np.uint8)
    nafter = mult_of(ka, va).astype(np.uint8)

    nbr = np.full((ne, 9), -1, dtype=np.int32)
    orient = np.zeros(ne, dtype=np.uint16)
    nbr[:, 0] = lookup(kb, vb, rank)          # colinear predecessor
    p1 = _P1[axis]
    p2 = _P2[axis]
    slot = 1
    for corner in (0, 1):
        cpos = start + corner * e_d
        for p in (p1, p2):
            e_p = np.zeros((ne, 3), dtype=np.int64)
            e_p[np.arange(ne), p] = w
            # neighbour STARTING at the corner: vertex near the corner
            # has a small position -> orientation flip
            ks, vs = key_of(cpos, p)
            nbr[:, slot] = lookup(ks, vs, rank)
            orient |= np.uint16(1 << slot)
            slot += 1
            # neighbour ENDING at the corner: no flip
            ke, ve = key_of(cpos - e_p, p)
            nbr[:, slot] = lookup(ke, ve, rank)
            slot += 1
    # the per-edge orientation word is constant by slot layout:
    # flips at slots 1,3,5,7 (starts-at-corner)
    orient = np.full(ne, (1 << 1) | (1 << 3) | (1 << 5) | (1 << 7),
                     dtype=np.uint16)
    # self-lookups: an edge must not reference itself
    self_hit = nbr == np.arange(ne, dtype=np.int32)[:, None]
    nbr[self_hit] = -1
    return (order, nbr, orient, cmult, nbefore, nafter,
            axis.astype(np.uint8))
