"""Fully on-device octree geometry codec: interleaved rANS entropy.

The reference couples octree traversal to a *serial* adaptive binary
arithmetic coder (geometry_octree_encoder.cpp:1853-2660 feeding
EntropyEncoder, schroarith dirac core): every occupancy bit updates a
context and renormalises a single coder state, so the entropy stage is
irreducibly sequential and lives on the CPU.  On TPU the right split is
different.  This module keeps the *whole* geometry codec on device —
analysis, context modelling, and entropy coding — so the only traffic
on the host link is the compressed bitstream itself (~1 byte/point),
the information-theoretic floor.

Three TPU-first redesigns make the entropy stage data-parallel:

* **K-lane interleaved rANS** (Duda's rANS in the interleaved form used
  by throughput-oriented codecs): K independent u32 coder states,
  symbol i of a level is coded by lane ``i % K``.  One VPU-wide vector
  step encodes/decodes K symbols; renormalisation moves whole uint16
  words, at most one per symbol.  The word stream is a SINGLE
  sequential stream: the decoder pops words in (step, lane) order and
  the encoder — which runs the steps in reverse — writes each step's
  words into a dense per-step buffer that one sorted-scatter pass
  compacts into exactly that order, so no per-lane length table is
  signalled at all.

* **Tile-causal adaptive tables** instead of per-symbol adaptation.
  A serial coder adapts contexts after every symbol; that is the very
  dependency that forbids vectorisation.  Here both sides derive the
  quantised frequency table from the exact histogram of all PREVIOUS
  coded symbols, refreshed every UPD_TILES tiles of K symbols (plus a
  Laplace prior) — deterministic integer math on both encoder and
  decoder, zero table signalling, and within a refresh window every
  symbol codes in parallel against a frozen table.  Measured on the
  bench surface clouds this tile-granular adaptation is ~8% above the
  host's per-symbol adaptive coder (level-granular was ~23% above).

* **Occupancy-byte alphabet, parent-conditioned contexts** shared with
  the host native syntax (ops/octree.py CTX_MODE_PARENT): symbol =
  8-bit child occupancy, context = child-position(3b) | parent
  occupancy(8b), 2048 contexts.  All context ids of a level are a
  vector function of the previous level's decoded bytes, so decode
  needs one barrier per level, not per node.

Both directions are ONE jitted program each with *compile-once loop
structure*: the level sweeps are ``lax.scan``/``fori_loop`` bodies and
the emission is a single global ``while_loop`` over (level, tile)
steps, so compile cost is one level body — not depth unrolled copies
(the first cut unrolled the levels in Python and took minutes to
compile; this one compiles in seconds and is cached thereafter).

rANS parameters: state u32 in [2^16, 2^32), 16-bit renorm words,
probability precision M = 2^14 (the 255-symbol Laplace reservation
costs 255/M of probability mass; 2^14 keeps that under 2%, and the
renorm bound (L >> M_BITS) << 16 * f still fits u32).  Payload:
per-level node counts, the K final states, and the word stream.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

M_BITS = 14
M = 1 << M_BITS                 # probability precision
RANS_L = 1 << 16                # state lower bound
N_CTX = 2048                    # child_idx(3b) << 8 | parent_occupancy
UPD_TILES = 4                   # tiles of K symbols between table refreshes
_I64_MAX = np.iinfo(np.int64).max


def _ceil_div(a, b):
    return (a + b - 1) // b


# =====================================================================
# analysis: per-level (occupancy, context) rows via closed-form ranks
# =====================================================================


def _analysis(leaf: jnp.ndarray, depth: int, nmax: int):
    """Per-level occupancy + context rows, (depth, nmax) int32.

    leaf: (nmax,) sorted Morton codes (pad = repeats of the last code;
    duplicates collapse).  Row l holds the level-l nodes' occupancy
    bytes / context ids compacted to the front (padding occ=1 ctx=0 —
    safe table indices).  Same closed-form rank construction as
    ops.octree.encode_occ_u8: one xor+clz pass + one (depth, N) cumsum
    + two sorted segment-sums, no per-level host loop.
    """
    from .octree import _min_levels

    c = leaf
    minlev = _min_levels(c, depth)

    lvec = jnp.arange(depth, dtype=jnp.int32)[:, None]       # (depth,1)
    first = minlev[None, :] <= lvec                          # (depth,N)
    seg = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    counts = seg[:, -1] + 1

    # child octant of point i at level l+1, int32 sweep (bit-30 split)
    shift = 3 * (depth - 1) - 3 * lvec                       # (depth,1)
    clo = (c & ((1 << 30) - 1)).astype(jnp.int32)
    chi = (c >> 30).astype(jnp.int32)
    oct_lo = (clo[None, :] >> jnp.minimum(shift, 29)) & 7
    oct_hi = (chi[None, :] >> jnp.maximum(shift - 30, 0)) & 7
    octant = jnp.where(shift >= 30, oct_hi, oct_lo)          # (depth,N)

    dest = lvec * nmax + seg                                 # (depth,N)
    contrib = jnp.where(minlev[None, :] <= lvec + 1,
                        (1 << octant).astype(jnp.int32), 0)
    occ2d = jax.ops.segment_sum(
        contrib.reshape(-1), dest.reshape(-1),
        num_segments=depth * nmax, indices_are_sorted=True)

    # node's own octant within its parent: the octant computed at the
    # PREVIOUS sweep row (level l node = level l-1 split result)
    self_oct = jnp.concatenate(
        [jnp.zeros((1, octant.shape[1]), jnp.int32), octant[:-1]])
    # parent occupancy byte: gather from the previous level's occ row
    pseg = jnp.concatenate(
        [jnp.zeros((1, seg.shape[1]), jnp.int32), seg[:-1]])
    pidx = jnp.maximum(lvec - 1, 0) * nmax + pseg
    pocc = occ2d[pidx.reshape(-1)].reshape(depth, -1)
    ctx_val = jnp.where(lvec > 0, (self_oct << 8) | pocc, 0)
    ctx2d = jax.ops.segment_sum(
        jnp.where(first, ctx_val, 0).reshape(-1), dest.reshape(-1),
        num_segments=depth * nmax, indices_are_sorted=True)

    row = jnp.arange(nmax, dtype=jnp.int32)[None, :]
    valid = row < counts[:, None]
    occ = jnp.where(valid, occ2d.reshape(depth, nmax), 1)
    ctx = jnp.where(valid, ctx2d.reshape(depth, nmax), 0)
    return occ, ctx, counts.astype(jnp.int32)


# =====================================================================
# level-causal table derivation (identical on encoder and decoder)
# =====================================================================


def _quantize_cfull(hist: jnp.ndarray) -> jnp.ndarray:
    """Quantised cumulative frequency table from a raw histogram.

    hist: (N_CTX, 256) int32 symbol counts (column 0 unused — occupancy
    0 cannot occur).  Returns c_full (N_CTX, 256) int32 with
    c_full[:, 0] = 0, c_full[:, 255] = M, and freq[s] = c[s] - c[s-1]
    >= 1 for every s in 1..255 (cumulative-rounding scheme: monotone by
    construction, exact sum, deterministic integer math).
    """
    h = hist[:, 1:].astype(jnp.int64) + 1           # Laplace prior
    cs = jnp.cumsum(h, axis=1)
    tot = cs[:, -1:]
    scaled = (cs * (M - 255)) // tot
    sym_ix = jnp.arange(1, 256, dtype=jnp.int64)[None, :]
    c_full = jnp.concatenate(
        [jnp.zeros((hist.shape[0], 1), jnp.int64), sym_ix + scaled],
        axis=1)
    return c_full.astype(jnp.int32)


def _search_sym(c_flat: jnp.ndarray, ctxv: jnp.ndarray,
                slot: jnp.ndarray) -> jnp.ndarray:
    """Vectorised symbol lookup: largest s with c_full[ctx][s] <= slot,
    returned as sym = s + 1 (c_full rows are strictly increasing with
    c[0] = 0 and c[255] = M, so sym lands in 1..255).  Branchless
    8-step binary search, one K-wide gather per step."""
    base = ctxv * 256
    pos = jnp.zeros_like(ctxv)
    for sh in (128, 64, 32, 16, 8, 4, 2, 1):
        cand = pos + sh
        ok = (cand <= 255) & (c_flat[base + cand] <= slot)
        pos = jnp.where(ok, cand, pos)
    return pos + 1


def _step_maps(counts: jnp.ndarray, K: int, s_cap: int):
    """Global (level, tile) step schedule from per-level node counts.

    Returns (step_lvl (s_cap,), step_base (s_cap,), G): decode step g
    codes symbols [step_base[g], step_base[g]+K) of level step_lvl[g];
    encode runs the same schedule in reverse.
    """
    T = _cdiv_j(counts, K)                          # (depth,)
    Tc = jnp.cumsum(T)
    G = Tc[-1]
    g = jnp.arange(s_cap, dtype=jnp.int32)
    lvl = jnp.searchsorted(Tc, g, side="right").astype(jnp.int32)
    lvl = jnp.minimum(lvl, counts.shape[0] - 1)
    start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             Tc[:-1].astype(jnp.int32)])
    base = (g - start[lvl]) * K
    return lvl, base, G.astype(jnp.int32)


def _cdiv_j(a, b):
    return (a + b - 1) // b


# =====================================================================
# encode: ONE jitted program, compile-once loop structure
# =====================================================================


@partial(jax.jit, static_argnames=("depth", "nmax", "lanes"))
def encode_device(leaf: jnp.ndarray, depth: int, nmax: int,
                  lanes: int = 1024):
    """Full on-device geometry encode.

    leaf: (nmax,) sorted Morton codes (pad = last-code repeats).
    Returns (payload u8 buffer, used_bytes scalar).  Layout:
      [depth x u32 counts][lanes x u32 final states][u32 total_words]
      [total_words x u16 word stream]
    Only the first `used_bytes` of the buffer are meaningful.
    """
    K = lanes
    nmax_p = (_ceil_div(nmax, K) + 1) * K
    # hard bound on the global (level, tile) step count: every level
    # has <= nmax nodes (sparse chains really do approach depth*n
    # total nodes — a geometric 8n/7 bound only holds for dense trees)
    s_cap = depth * _ceil_div(nmax, K) + depth + 1
    occ2, ctx2, counts = _analysis(leaf, depth, nmax)
    pad = nmax_p - nmax
    occF = jnp.pad(occ2, ((0, 0), (0, pad)),
                   constant_values=1).reshape(-1)
    ctxF = jnp.pad(ctx2, ((0, 0), (0, pad))).reshape(-1)
    step_lvl, step_base, G = _step_maps(counts, K, s_cap)
    lane_ix = jnp.arange(K, dtype=jnp.int32)

    # ---- forward table pass: per-node (freq, cumstart), table
    # refreshed every UPD_TILES tiles, histogram updated every tile ----
    def table_body(carry, g):
        hist, c_flat = carry
        lvl = step_lvl[g]
        base = step_base[g]
        live = g < G
        refresh = live & ((base // K) % UPD_TILES == 0)
        c_flat = jax.lax.cond(
            refresh, lambda h, c: _quantize_cfull(h).reshape(-1),
            lambda h, c: c, hist, c_flat)
        off = lvl * nmax_p + base
        sym = jax.lax.dynamic_slice(occF, (off,), (K,))
        ctxv = jax.lax.dynamic_slice(ctxF, (off,), (K,))
        valid = live & (base + lane_ix < counts[lvl])
        ix = ctxv * 256 + sym
        hi = c_flat[ix]
        lo = c_flat[ix - 1]
        hist = hist.reshape(-1).at[
            jnp.where(valid, ix, N_CTX * 256)].add(
            1, mode="drop").reshape(N_CTX, 256)
        return (hist, c_flat), (jnp.where(valid, hi - lo, 1),
                                jnp.where(valid, lo, 0))

    (_, _), (fN, cN) = jax.lax.scan(
        table_body,
        (jnp.zeros((N_CTX, 256), jnp.int32),
         _quantize_cfull(jnp.zeros((N_CTX, 256), jnp.int32))
         .reshape(-1)),
        jnp.arange(s_cap, dtype=jnp.int32))

    # ---- reverse rANS emission: one global while_loop ----------------
    def emit_body(carry):
        g, states, wdense, fdense = carry
        lvl = step_lvl[g]
        base = step_base[g]
        z = jnp.int32(0)
        f = jax.lax.dynamic_slice(fN, (g, z), (1, K))[0]
        c = jax.lax.dynamic_slice(cN, (g, z), (1, K))[0]
        valid = base + lane_ix < counts[lvl]
        f = jnp.where(valid, f, 1).astype(jnp.uint32)
        emit = valid & (states >= (f << (32 - M_BITS)))
        w16 = (states & 0xFFFF).astype(jnp.int32)
        x = jnp.where(emit, states >> 16, states)
        q = x // f
        r = x - q * f
        nxt = (q << M_BITS) + r + c.astype(jnp.uint32)
        states = jnp.where(valid, nxt, x)
        wdense = jax.lax.dynamic_update_slice(
            wdense, jnp.where(emit, w16, 0)[None, :], (g, z))
        fdense = jax.lax.dynamic_update_slice(
            fdense, emit[None, :], (g, z))
        return g - 1, states, wdense, fdense

    init = (G - 1, jnp.full((K,), RANS_L, jnp.uint32),
            jnp.zeros((s_cap, K), jnp.int32),
            jnp.zeros((s_cap, K), bool))
    _, states, wdense, fdense = jax.lax.while_loop(
        lambda cr: cr[0] >= 0, emit_body, init)

    # ---- single-stream compaction in decode read order ---------------
    # decoder pops words in (step asc, lane asc) order — exactly the
    # row-major flatten of the dense buffers; sorted-scatter compaction
    mflat = fdense.reshape(-1)
    xflat = wdense.reshape(-1)
    m32 = mflat.astype(jnp.int32)
    cums = jnp.cumsum(m32)
    total_words = cums[-1]
    # slot of the i-th word = its inclusive rank - 1; skipped entries
    # alias the next slot with a zero value (sorted-scatter compaction)
    dest = cums - m32
    wcap = s_cap * K
    words = jax.ops.segment_sum(
        jnp.where(mflat, xflat, 0), dest,
        num_segments=wcap + 1, indices_are_sorted=True)[:wcap]

    # ---- payload assembly -------------------------------------------
    sh32 = jnp.asarray([0, 8, 16, 24], jnp.uint32)

    def u32_bytes(a):
        return jax.lax.shift_right_logical(
            a[:, None].astype(jnp.uint32), sh32[None, :],
        ).astype(jnp.uint8).reshape(-1)

    sh16 = jnp.asarray([0, 8], jnp.uint32)
    w_u8 = jax.lax.shift_right_logical(
        words[:, None].astype(jnp.uint32), sh16[None, :],
    ).astype(jnp.uint8).reshape(-1)
    buf = jnp.concatenate([
        u32_bytes(counts), u32_bytes(states),
        u32_bytes(total_words[None]), w_u8])
    used = 4 * (depth + K + 1) + 2 * total_words
    return buf, used


# =====================================================================
# decode: ONE jitted program, fori over levels
# =====================================================================


@partial(jax.jit, static_argnames=("depth", "nmax", "lanes"))
def decode_device(counts: jnp.ndarray, states0: jnp.ndarray,
                  words: jnp.ndarray, depth: int, nmax: int,
                  lanes: int = 1024):
    """Full on-device geometry decode.

    counts (depth,) i32, states0 (K,) u32, words (wcap,) i32 of u16
    values (single interleaved stream).  Returns (leaf codes (nmax,)
    i64 padded with I64_MAX, leaf count).
    """
    K = lanes
    nmax_p = (_ceil_div(nmax, K) + 1) * K
    wcap = words.shape[0]
    lane_ix = jnp.arange(K, dtype=jnp.int32)
    row = jnp.arange(nmax, dtype=jnp.int32)
    bits8 = jnp.arange(8, dtype=jnp.int32)

    def level_body(l, carry):
        states, cursor, hist, c_flat, nodes, cnt, ctx_row = carry
        T_l = _cdiv_j(counts[l], K)

        def tile_body(tc):
            t, states, cursor, syms_buf, hist, c_flat = tc
            # table refresh at the same cadence as the encoder's
            # forward pass (every UPD_TILES tiles within the level)
            c_flat = jax.lax.cond(
                t % UPD_TILES == 0,
                lambda h, c: _quantize_cfull(h).reshape(-1),
                lambda h, c: c, hist, c_flat)
            base = t * K
            valid = base + lane_ix < counts[l]
            ctxv = jax.lax.dynamic_slice(ctx_row, (base,), (K,))
            slot = (states & (M - 1)).astype(jnp.int32)
            sym = _search_sym(c_flat, ctxv, slot)
            ix = ctxv * 256 + sym
            lo = c_flat[ix - 1]
            f = (c_flat[ix] - lo).astype(jnp.uint32)
            cs = lo.astype(jnp.uint32)
            st = f * (states >> M_BITS) + slot.astype(jnp.uint32) - cs
            need = valid & (st < RANS_L)
            # words pop in lane order within the step: rank by
            # exclusive prefix over the need mask
            nrank = jnp.cumsum(need.astype(jnp.int32)) \
                - need.astype(jnp.int32)
            widx = jnp.minimum(cursor + nrank, wcap - 1)
            w = words[widx].astype(jnp.uint32)
            st = jnp.where(need, (st << 16) | w, st)
            states = jnp.where(valid, st, states)
            cursor = cursor + jnp.sum(need, dtype=jnp.int32)
            syms_buf = jax.lax.dynamic_update_slice(
                syms_buf, jnp.where(valid, sym, 1), (base,))
            hist = hist.reshape(-1).at[
                jnp.where(valid, ix, N_CTX * 256)].add(
                1, mode="drop").reshape(N_CTX, 256)
            return t + 1, states, cursor, syms_buf, hist, c_flat

        _, states, cursor, syms_buf, hist, c_flat = jax.lax.while_loop(
            lambda tc: tc[0] < T_l, tile_body,
            (jnp.int32(0), states, cursor,
             jnp.zeros((nmax_p,), jnp.int32), hist, c_flat))

        occ_l = syms_buf[:nmax]

        # expand children + next level contexts (sorted rank-scatter,
        # same construction as ops.octree._expand_level)
        occ_v = jnp.where(row < counts[l], occ_l, 0)
        pops = jax.lax.population_count(occ_v)
        starts = jnp.cumsum(pops) - pops
        new_cnt = starts[-1] + pops[-1]
        rank = jax.lax.population_count(
            occ_v[:, None] & ((1 << bits8) - 1)[None, :])
        # dst is globally non-decreasing over the flattened (node, bit)
        # order; invalid bits alias the next valid child's slot with a
        # zero value, so ONE sorted segment-sum places every child
        dst = (starts[:, None] + rank).reshape(-1)
        bvalid = (((occ_v[:, None] >> bits8[None, :]) & 1) > 0) \
            .reshape(-1)
        child = ((nodes[:, None] << 3)
                 | bits8[None, :].astype(jnp.int64)).reshape(-1)
        out = jax.ops.segment_sum(
            jnp.where(bvalid, child, 0), dst, num_segments=nmax + 1,
            indices_are_sorted=True)[:nmax]
        prow = jnp.broadcast_to(row[:, None], (nmax, 8)).reshape(-1)
        parent = jax.ops.segment_sum(
            jnp.where(bvalid, prow, 0), dst,
            num_segments=nmax + 1, indices_are_sorted=True)[:nmax]
        valid_n = row < new_cnt
        nodes = jnp.where(valid_n, out, _I64_MAX)
        child_ix = (nodes & 7).astype(jnp.int32)
        ctx_next = jnp.where(
            valid_n, (child_ix << 8) | occ_l[parent], 0)
        ctx_row = jnp.pad(ctx_next, (0, nmax_p - nmax))
        return (states, cursor, hist, c_flat, nodes, new_cnt, ctx_row)

    init = (states0, jnp.int32(0),
            jnp.zeros((N_CTX, 256), jnp.int32),
            _quantize_cfull(jnp.zeros((N_CTX, 256), jnp.int32))
            .reshape(-1),
            jnp.full((nmax,), _I64_MAX, jnp.int64).at[0].set(0),
            jnp.int32(1), jnp.zeros((nmax_p,), jnp.int32))
    _, _, _, _, nodes, cnt, _ = jax.lax.fori_loop(
        0, depth, level_body, init)
    return nodes, cnt


# =====================================================================
# host-side payload helpers
# =====================================================================


def parse_payload(buf: np.ndarray, depth: int, lanes: int = 1024):
    """Split an encode_device payload buffer (host-side, cheap)."""
    u8 = np.asarray(buf, dtype=np.uint8)
    off = 0
    counts = u8[off:off + 4 * depth].view("<u4").astype(np.int32)
    off += 4 * depth
    states = u8[off:off + 4 * lanes].view("<u4")
    off += 4 * lanes
    total_words = int(u8[off:off + 4].view("<u4")[0])
    off += 4
    words = u8[off:off + 2 * total_words].view("<u2").astype(np.int32)
    return counts, states, words


def roundtrip_host(leaf: np.ndarray, depth: int, nmax: int | None = None,
                   lanes: int = 64):
    """Host-callable encode->decode round trip (tests / reference)."""
    leaf = np.asarray(leaf, dtype=np.int64)
    n = leaf.shape[0]
    if nmax is None:
        nmax = max(64, n)
    pad = np.empty(nmax, dtype=np.int64)
    pad[:n] = leaf
    pad[n:] = leaf[-1] if n else 0
    buf, used = encode_device(jnp.asarray(pad), depth, nmax, lanes)
    u8 = np.asarray(buf)[:int(used)]
    counts, states, words = parse_payload(u8, depth, lanes)
    wcap = max(64, words.shape[0])
    words_p = np.zeros(wcap, np.int32)
    words_p[:words.shape[0]] = words
    nodes, cnt = decode_device(
        jnp.asarray(counts), jnp.asarray(states),
        jnp.asarray(words_p), depth, nmax, lanes)
    return np.asarray(nodes)[:int(cnt)], len(u8)
