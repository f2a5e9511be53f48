"""Device fixed-point RAHT: the TPU execution of ops/raht_fp.py.

Everything data-dependent is integer adds/multiplies/shifts/floor-divs
on int64 tensors — bit-identical to the numpy spec and the native C++
engine, so the three backends produce the same quantised coefficients
and therefore the same zrow stream.

The geometry-derived structure (level sizes, block gathers, butterfly
Q15 coefficients, 18-neighbour tables, sqrt scales, pair masks and the
coded-order compaction indices) is precomputed per frame on the host
(`build_fp_plan`) — it is static data, exactly what an accelerator
wants hoisted.  The per-level device step is then pure gathers +
integer VPU math:

  encode: truth bottom-up (block butterflies), then top-down per
  group: prediction from reconstructed parent means -> forward network
  -> residual -> deadzone quantise.  q rows stream to the host, whose
  only job is the (inherently serial) zrow range coding.
  decode: host entropy-decodes every group's q rows up front (the row
  counts are geometry-static), uploads them, and the device runs the
  same prediction + inverse network top-down with no further host
  round trips.

Counterpart of the reference fixed-point uraht_process
(RAHT.cpp:672-737, 977) restructured per SURVEY.md §7.4.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from . import raht_fp
from .raht import _offset_neighbor_codes, _TOUCH_TABLE

F = raht_fp.F
QA = raht_fp.QA
QAH = 1 << (QA - 1)
HALF = raht_fp.HALF


# ---------------------------------------------------------------------
# host-side plan
# ---------------------------------------------------------------------

@dataclass
class GroupPlan:
    mp: int
    mc: int
    blk_gather: np.ndarray      # (mp, 8) i32 child row per octant, -1
    blk_present: np.ndarray     # (mp, 8) bool
    pidx: np.ndarray            # (mc,) parent row per child
    oct: np.ndarray             # (mc,) child octant
    sw_c: np.ndarray            # (mc,) Q15 sqrt(child weight)
    sw_p: np.ndarray            # (mp,) Q15 sqrt(parent weight)
    w_p: np.ndarray             # (mp,) parent weights
    # butterfly coefficients + pair masks per stage (z, y, x)
    az: np.ndarray              # (mp, 4) Q15
    bz: np.ndarray
    vz: np.ndarray              # (mp, 4) bool: both children present
    sz: np.ndarray              # (mp, 4) i8: single-source octant (rel)
    ay: np.ndarray              # (mp, 2)
    by: np.ndarray
    vy: np.ndarray
    sy: np.ndarray
    ax: np.ndarray              # (mp,)
    bx: np.ndarray
    vx: np.ndarray
    sx: np.ndarray
    # coded-order compaction: flat indices into the padded (mp, k)
    # pair grid per stage, in zrow order
    flat_z: np.ndarray
    flat_y: np.ndarray
    flat_x: np.ndarray
    # prediction
    nbr_idx: np.ndarray         # (mp, 18) i32
    nbr_ok: np.ndarray          # (mp, 18) bool
    cnt_p: np.ndarray           # (mp,) 1 + present neighbours
    en_base: np.ndarray         # (mp,) cnt >= t1 (t0 term joins later)


def _stage_coeffs(w_cells: np.ndarray, occ: np.ndarray):
    """Per-block pair data for one stage: w_cells (mp, 2k) weights of
    the stage's input cells (0 = absent).  Returns merged weights
    (mp, k) plus (a, b, valid, single_src)."""
    w0 = w_cells[:, 0::2].astype(np.int64)
    w1 = w_cells[:, 1::2].astype(np.int64)
    both = (w0 > 0) & (w1 > 0)
    ws = np.maximum(w0 + w1, 1)
    a = raht_fp.isqrt64((w0 << 30) // ws)
    b = raht_fp.isqrt64((w1 << 30) // ws)
    # single-source: which input cell flows through (0/1; -1 dead)
    ssrc = np.where(w0 > 0, 0, np.where(w1 > 0, 1, -1)).astype(np.int8)
    return (w0 + w1), both, a, b, ssrc


def build_fp_plan(leaf_codes: np.ndarray, depth: int,
                  thresholds=(raht_fp._PRED_T0, raht_fp._PRED_T1)):
    """Per-frame static structure, finest group first
    (plans[0] merges leaves)."""
    codes = leaf_codes.astype(np.int64)
    w = np.ones(codes.shape[0], dtype=np.int64)
    plans: List[GroupPlan] = []
    for g in range(depth):
        parent = codes >> 3
        oct_ = (codes & 7).astype(np.int32)
        first = np.concatenate([[True], parent[1:] != parent[:-1]]) \
            if codes.size else np.zeros(0, bool)
        pidx = (np.cumsum(first) - 1).astype(np.int32)
        mp = int(pidx[-1]) + 1 if codes.size else 0
        mc = codes.shape[0]
        gather = np.full((mp, 8), -1, dtype=np.int32)
        gather[pidx, oct_] = np.arange(mc, dtype=np.int32)
        present = gather >= 0
        blk_w = np.where(present, w[np.maximum(gather, 0)], 0)

        wz, vz, az, bz, sz = _stage_coeffs(blk_w, present)
        wy, vy, ay, by, sy = _stage_coeffs(wz, wz > 0)
        wx, vx, ax, bx, sx = _stage_coeffs(wy, wy > 0)

        parent_codes = parent[first]
        parent_w = wx[:, 0]
        nbr_idx, nbr_ok = _offset_neighbor_codes(
            parent_codes, depth - 1 - g)
        cnt_p = 1 + nbr_ok.sum(axis=1).astype(np.int64)

        plans.append(GroupPlan(
            mp=mp, mc=mc,
            blk_gather=gather, blk_present=present,
            pidx=pidx, oct=oct_,
            sw_c=raht_fp.sqrt_q15(w), sw_p=raht_fp.sqrt_q15(parent_w),
            w_p=parent_w,
            az=az, bz=bz, vz=vz, sz=sz,
            ay=ay, by=by, vy=vy, sy=sy,
            ax=ax[:, 0], bx=bx[:, 0], vx=vx[:, 0], sx=sx[:, 0],
            flat_z=np.flatnonzero(vz.reshape(-1)).astype(np.int32),
            flat_y=np.flatnonzero(vy.reshape(-1)).astype(np.int32),
            flat_x=np.flatnonzero(vx).astype(np.int32),
            nbr_idx=nbr_idx.astype(np.int32), nbr_ok=nbr_ok,
            cnt_p=cnt_p,
            en_base=cnt_p >= thresholds[1],
        ))
        codes = parent_codes
        w = parent_w
    return plans


# ---------------------------------------------------------------------
# device steps (pure jnp; int64 math identical to the numpy spec)
# ---------------------------------------------------------------------

def _jnp():
    import jax.numpy as jnp
    return jnp


def _fwd_block(vals8, p):
    """Forward network on (mp, 8, C) block values with plan p (device
    arrays).  Returns (dc (mp, C), acz (mp,4,C), acy (mp,2,C),
    acx (mp,1,C)) — invalid pair slots hold zeros."""
    jnp = _jnp()

    def stage(v, a, b, valid, ssrc):
        # v: (mp, 2k, C) -> (mp, k, C); a/b (mp, k)
        v0 = v[:, 0::2]
        v1 = v[:, 1::2]
        a = a[..., None]
        b = b[..., None]
        dc = (a * v0 + b * v1 + QAH) >> QA
        ac = (a * v1 - b * v0 + QAH) >> QA
        single = jnp.where(ssrc[..., None] == 1, v1, v0)
        out = jnp.where(valid[..., None], dc, single)
        ac = jnp.where(valid[..., None], ac, 0)
        return out, ac

    vz, acz = stage(vals8, p["az"], p["bz"], p["vz"], p["sz"])
    vy, acy = stage(vz, p["ay"], p["by"], p["vy"], p["sy"])
    vx, acx = stage(vy, p["ax"][:, None], p["bx"][:, None],
                    p["vx"][:, None], p["sx"][:, None])
    return vx[:, 0], acz, acy, acx


def _inv_block(dc, acz, acy, acx, p):
    """Inverse network: dc (mp, C) + per-stage AC grids -> (mp, 8, C)."""
    jnp = _jnp()

    def unstage(v, ac, a, b, valid, ssrc):
        # v (mp, k, C) -> (mp, 2k, C)
        a = a[..., None]
        b = b[..., None]
        v0 = (a * v - b * ac + QAH) >> QA
        v1 = (b * v + a * ac + QAH) >> QA
        s = ssrc[..., None] == 1
        out0 = jnp.where(valid[..., None], v0, jnp.where(s, 0, v))
        out1 = jnp.where(valid[..., None], v1, jnp.where(s, v, 0))
        mp, k, C = v.shape
        return jnp.stack([out0, out1], axis=2).reshape(mp, 2 * k, C)

    vy = unstage(dc[:, None], acx, p["ax"][:, None], p["bx"][:, None],
                 p["vx"][:, None], p["sx"][:, None])
    vz = unstage(vy, acy, p["ay"], p["by"], p["vy"], p["sy"])
    v8 = unstage(vz, acz, p["az"], p["bz"], p["vz"], p["sz"])
    return v8


def _predict(recon_p, grand_p, p, t0, t1, weights, have_grand):
    """Fixed-point prediction per child (mc, C), from parent recon."""
    jnp = _jnp()
    w_self, w_face, w_edge = weights
    pf = jnp.floor_divide(recon_p << QA, p["sw_p"][:, None])
    pv = pf[:, 0]
    nv = pf[p["nbr_idx"]]                        # (mp, 18, C)
    nl = nv[..., 0]
    keep = p["nbr_ok"] & (10 * nl > 2 * pv[:, None]) \
        & (10 * nl < 25 * pv[:, None])
    en = p["en_base"]
    if have_grand:
        en = en & (grand_p >= t0)

    # per-octant sums: s_oct (mp, 8, C) = sum_{j touching o}
    # keep*wvec_j*nv[m,j,c]; w_oct (mp, 8) the matching weight totals.
    # Unrolled elementwise adds (ints are commutative, so any order is
    # exact): TPU's X64 rewrite has no s64 dot, and each octant only
    # touches 6 offsets anyway.
    kw = keep.astype(jnp.int64)                          # (mp, 18)
    touch_np = _TOUCH_TABLE.astype(np.int64)
    wvec_np = np.array([w_face] * 6 + [w_edge] * 12, dtype=np.int64)
    s_cols = []
    w_cols = []
    for o in range(8):
        js = np.nonzero(touch_np[:, :][o])[0]
        s_o = None
        w_o = None
        for j in js:
            term = nv[:, j] * (kw[:, j] * int(wvec_np[j]))[:, None]
            wterm = kw[:, j] * int(wvec_np[j])
            s_o = term if s_o is None else s_o + term
            w_o = wterm if w_o is None else w_o + wterm
        s_cols.append(s_o)
        w_cols.append(w_o)
    s_oct = jnp.stack(s_cols, axis=1)                    # (mp, 8, C)
    w_oct = jnp.stack(w_cols, axis=1)                    # (mp, 8)

    pi = p["pidx"]
    oc = p["oct"]
    acc = pf[pi] * w_self + s_oct[pi, oc]
    wsum = w_self + w_oct[pi, oc]
    pm = jnp.floor_divide(acc, wsum[:, None])
    pred = (pm * p["sw_c"][:, None] + QAH) >> QA
    pred = jnp.where(en[pi][:, None], pred, 0)
    # next group's grandparent counts live per CHILD (numpy spec
    # returns parent_counts[pidx])
    return pred, p["cnt_p"][pi]


def _quant(res, steps):
    jnp = _jnp()
    a = jnp.abs(res)
    st = steps[None, :]
    q = jnp.floor_divide(24 * a + st, 3 * st)
    return jnp.where(res < 0, -q, q)


def _dequant(q, steps):
    jnp = _jnp()
    a = jnp.abs(q)
    d = (a * steps[None, :] + 4) >> 3
    return jnp.where(q < 0, -d, d)


def _gather_blocks(vals, p):
    jnp = _jnp()
    g = jnp.asarray(p["blk_gather"])
    occ = g >= 0
    return jnp.where(occ[..., None], vals[jnp.maximum(g, 0)], 0)


def _compact(acz, acy, acx, p):
    """Padded AC grids -> (npairs, C) rows in zrow coded order per
    stage, concatenated z|y|x (the per-group emission order)."""
    jnp = _jnp()
    mp = acz.shape[0]
    C = acz.shape[-1]
    z = acz.reshape(mp * 4, C)[p["flat_z"]]
    y = acy.reshape(mp * 2, C)[p["flat_y"]]
    x = acx.reshape(mp, C)[p["flat_x"]]
    return z, y, x


def isqrt64_dev(x):
    """Device floor(sqrt(x)) for int64, identical to raht_fp.isqrt64
    (f64 seed truncated + two integer corrections)."""
    jnp = _jnp()
    y = jnp.sqrt(x.astype(jnp.float64)).astype(jnp.int64)
    for _ in range(2):
        y = jnp.where((y + 1) * (y + 1) <= x, y + 1, y)
        y = jnp.where(y * y > x, y - 1, y)
    return jnp.maximum(y, 0)


def fwd_blocks_int(blk_v, blk_w):
    """Compiled integer block butterfly with ON-DEVICE coefficients.

    blk_v (B, 8, C) int64 Q13 values, blk_w (B, 8) int64 subtree
    weights (0 = empty slot).  Returns (dc (B, C), acz (B,4,C),
    acy (B,2,C), acx (B,1,C)) — the mesh-compiled attribute stage
    (no Pallas, no interpret mode; plain XLA integer ops)."""
    jnp = _jnp()

    def stage(v, w):
        v0, v1 = v[:, 0::2], v[:, 1::2]
        w0, w1 = w[:, 0::2], w[:, 1::2]
        both = (w0 > 0) & (w1 > 0)
        ws = jnp.maximum(w0 + w1, 1)
        a = isqrt64_dev((w0 << 30) // ws)[..., None]
        b = isqrt64_dev((w1 << 30) // ws)[..., None]
        dc = (a * v0 + b * v1 + QAH) >> QA
        ac = (a * v1 - b * v0 + QAH) >> QA
        single = jnp.where((w0 > 0)[..., None], v0, v1)
        out = jnp.where(both[..., None], dc, single)
        ac = jnp.where(both[..., None], ac, 0)
        return out, ac, w0 + w1

    vz, acz, wz = stage(blk_v, blk_w)
    vy, acy, wy = stage(vz, wz)
    vx, acx, wx = stage(vy, wy)
    return vx[:, 0], acz, acy, acx


# ---- jitted per-level steps (shapes are static per frame level; the
# jit cache holds one entry per level size) -----------------------------

def _truth_level(vals, p):
    blk = _gather_blocks(vals, p)
    dc, acz, acy, acx = _fwd_block(blk, p)
    z, y, x = _compact(acz, acy, acx, p)
    return dc, z, y, x


def _enc_group(recon_p, grand_p, tz, ty, tx, steps, p,
               t0, t1, weights, have_grand):
    pred, cnt = _predict(recon_p, grand_p, p, t0, t1, weights,
                         have_grand)
    blkp = _gather_blocks(pred, p)
    _, pz, py, px = _fwd_block(blkp, p)
    pz, py, px = _compact(pz, py, px, p)
    qs = []
    recs = []
    for tr, pr in ((tz, pz), (ty, py), (tx, px)):
        qq = _quant(tr - pr, steps)
        qs.append(qq)
        recs.append(pr + _dequant(qq, steps))
    recon_c = _inverse_group_pure(recon_p, recs, p)
    return qs[0], qs[1], qs[2], recon_c, cnt


def _dec_group(recon_p, grand_p, qz, qy, qx, steps, p,
               t0, t1, weights, have_grand):
    pred, cnt = _predict(recon_p, grand_p, p, t0, t1, weights,
                         have_grand)
    blkp = _gather_blocks(pred, p)
    _, pz, py, px = _fwd_block(blkp, p)
    pz, py, px = _compact(pz, py, px, p)
    recs = [pr + _dequant(qq, steps)
            for pr, qq in zip((pz, py, px), (qz, qy, qx))]
    recon_c = _inverse_group_pure(recon_p, recs, p)
    return recon_c, cnt


def _inverse_group_pure(recon_p, rec_parts, p):
    jnp = _jnp()
    mp = p["az"].shape[0]
    C = recon_p.shape[-1]
    z = jnp.zeros((mp * 4, C), jnp.int64).at[p["flat_z"]] \
        .set(rec_parts[0]).reshape(mp, 4, C)
    y = jnp.zeros((mp * 2, C), jnp.int64).at[p["flat_y"]] \
        .set(rec_parts[1]).reshape(mp, 2, C)
    x = jnp.zeros((mp, C), jnp.int64).at[p["flat_x"]] \
        .set(rec_parts[2]).reshape(mp, 1, C)
    v8 = _inv_block(recon_p, z, y, x, p)
    g = p["blk_gather"]
    occ = g >= 0
    mc = p["pidx"].shape[0]
    flat = jnp.zeros((mc, C), jnp.int64)
    flat = flat.at[jnp.where(occ, g, 0)].add(
        jnp.where(occ[..., None], v8, 0))
    return flat


def _jits():
    import jax
    global _TRUTH_J, _ENC_J, _DEC_J
    if "_TRUTH_J" not in globals():
        _TRUTH_J = jax.jit(_truth_level)
        _ENC_J = jax.jit(_enc_group, static_argnames=(
            "t0", "t1", "weights", "have_grand"))
        _DEC_J = jax.jit(_dec_group, static_argnames=(
            "t0", "t1", "weights", "have_grand"))
    return _TRUTH_J, _ENC_J, _DEC_J


class DeviceFpRaht:
    """Per-frame device codec state: plan uploaded once, then
    encode()/decode() run the closed loop on device."""

    def __init__(self, leaf_codes: np.ndarray, depth: int,
                 steps_q16, thresholds=(raht_fp._PRED_T0,
                                        raht_fp._PRED_T1),
                 weights=(raht_fp._W_SELF, raht_fp._W_FACE,
                          raht_fp._W_EDGE)):
        import jax
        import jax.numpy as jnp
        self.depth = depth
        self.t0, self.t1 = thresholds
        self.weights = weights
        self.steps = jnp.asarray(np.asarray(steps_q16, dtype=np.int64))
        host_plans = build_fp_plan(leaf_codes, depth, thresholds)
        host_trees = []
        for hp in host_plans:
            host_trees.append({
                "blk_gather": hp.blk_gather,
                "pidx": hp.pidx.astype(np.int32),
                "oct": hp.oct,
                "sw_c": hp.sw_c,
                "sw_p": hp.sw_p,
                "az": hp.az, "bz": hp.bz, "vz": hp.vz, "sz": hp.sz,
                "ay": hp.ay, "by": hp.by, "vy": hp.vy, "sy": hp.sy,
                "ax": hp.ax, "bx": hp.bx, "vx": hp.vx, "sx": hp.sx,
                "flat_z": hp.flat_z,
                "flat_y": hp.flat_y,
                "flat_x": hp.flat_x,
                "nbr_idx": hp.nbr_idx,
                "nbr_ok": hp.nbr_ok,
                "cnt_p": hp.cnt_p,
                "en_base": hp.en_base,
            })
        # ONE batched transfer for the whole plan pytree: per-array
        # device_put costs a full link round trip each (~45 ms on a
        # tunnelled host), and a depth-11 plan holds ~250 arrays
        self.plans = jax.device_put(host_trees)
        self.pair_counts = [(hp.flat_z.size, hp.flat_y.size,
                             hp.flat_x.size) for hp in host_plans]
        self.n_roots = host_plans[-1].mp if host_plans else \
            leaf_codes.shape[0]

    def encode(self, values: np.ndarray, emit):
        """values (N, C) ints.  emit(q_rows int32 (m, C)) is called in
        coded order (root, then groups coarse->fine, z|y|x per group).
        All math on device (jitted per level); emit receives host
        arrays — the host's only job is the serial zrow coding."""
        import jax
        import jax.numpy as jnp
        truth_j, enc_j, _ = _jits()
        vals = jnp.asarray(np.asarray(values, dtype=np.int64)) << F
        acs_true = []          # per group (z, y, x) compacted
        cur = vals
        for g in range(self.depth):
            cur, z, y, x = truth_j(cur, self.plans[g])
            acs_true.append((z, y, x))
        root = cur                                   # (n_roots, C)

        q_root = _quant(root, self.steps)
        recon = _dequant(q_root, self.steps)
        grand = jnp.zeros((self.n_roots,), jnp.int64)
        pending = [q_root]
        for gi in range(self.depth):
            g = self.depth - 1 - gi                  # plan index
            tz, ty, tx = acs_true[g]
            qz, qy, qx, recon, grand = enc_j(
                recon, grand, tz, ty, tx, self.steps, self.plans[g],
                t0=self.t0, t1=self.t1, weights=self.weights,
                have_grand=gi > 0)
            pending.extend((qz, qy, qx))
        # ONE device->host transfer: the tunnel's per-transfer latency
        # dwarfs the bytes, so the coded-order q batches are fused on
        # device and split back on the host
        C = pending[0].shape[-1]
        flat = jnp.concatenate(
            [p.astype(jnp.int32).reshape(-1) for p in pending])
        host = np.asarray(flat)
        off = 0
        for p in pending:
            m = p.shape[0]
            emit(host[off:off + m * C].reshape(m, C))
            off += m * C
        return recon

    def decode(self, read_q, ncomp: int):
        """read_q(m) -> (m, ncomp) int32 host rows, called in coded
        order (the counts are geometry-static).  Returns device (N, C)
        integer values."""
        import jax.numpy as jnp
        _, _, dec_j = _jits()
        q_root = jnp.asarray(
            read_q(self.n_roots).astype(np.int64))
        recon = _dequant(q_root, self.steps)
        # read everything up front (host entropy is self-contained)
        group_qs = []
        for gi in range(self.depth):
            g = self.depth - 1 - gi
            nz, ny, nx = self.pair_counts[g]
            group_qs.append(tuple(
                jnp.asarray(read_q(m).astype(np.int64))
                for m in (nz, ny, nx)))
        grand = jnp.zeros((self.n_roots,), jnp.int64)
        for gi in range(self.depth):
            g = self.depth - 1 - gi
            qz, qy, qx = group_qs[gi]
            recon, grand = dec_j(
                recon, grand, qz, qy, qx, self.steps, self.plans[g],
                t0=self.t0, t1=self.t1, weights=self.weights,
                have_grand=gi > 0)
        return (recon + HALF) >> F
