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
  by throughput-oriented codecs): K independent u32 coder states, node
  i of a level is coded by lane ``i % K``.  One VPU-wide vector step
  encodes/decodes K symbols; renormalisation moves whole uint16 words,
  at most one per symbol, so each scan step is branch-free ``where``
  arithmetic.  K = 1024 matches the 8x128 VPU tile.

* **Level-causal adaptive tables** instead of per-symbol adaptation.
  A serial coder adapts contexts after every symbol; that is the very
  dependency that forbids vectorisation.  Here both sides derive the
  quantised frequency table for level ``l`` from the exact histogram of
  levels ``< l`` (plus a Laplace prior) — deterministic integer math on
  both encoder and decoder, zero table signalling, and within a level
  every symbol codes in parallel against a frozen table.  Adaptation
  granularity is one octree level (~8x growth per level keeps the
  stats fresh); measured rate is within a few % of the host's
  per-symbol adaptive coder on the bench clouds.

* **Occupancy-byte alphabet, parent-conditioned contexts** shared with
  the host native syntax (ops/octree.py CTX_MODE_PARENT): symbol =
  8-bit child occupancy, context = child-position(3b) | parent
  occupancy(8b), 2048 contexts.  All context ids of a level are a
  vector function of the previous level's decoded bytes (repeat by
  popcount), so decode needs one barrier per level, not per node.

Encode is ONE jitted program: analysis (implicit octree over sorted
Morton codes) -> forward table pass -> reverse-order rANS emission ->
on-device stream compaction into a single byte buffer.  Decode is ONE
jitted program: per level, rebuild the table, vector-decode the
level's symbols (while_loop over ceil(count/K) steps), expand children
(cumsum+searchsorted compaction, no scatters), leaves stay on device
for the attribute stages.

rANS parameters: state u32 in [2^16, 2^32), 16-bit renorm words,
probability precision M = 2^12.  Streams are interleaved per lane and
concatenated lane-major; per-lane word counts + final states travel in
the payload header.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

M_BITS = 12
M = 1 << M_BITS                 # probability precision
RANS_L = 1 << 16                # state lower bound
N_CTX = 2048                    # child_idx(3b) << 8 | parent_occupancy
_I64_MAX = np.iinfo(np.int64).max


def _ceil_div(a, b):
    return (a + b - 1) // b


# =====================================================================
# analysis: per-level (occupancy, context) streams, compacted
# =====================================================================


def _analysis(leaf: jnp.ndarray, depth: int, nmax: int):
    """Per-level compacted occupancy + context streams.

    leaf: (n,) sorted UNIQUE Morton codes.  Returns (occ, ctx, counts):
    occ/ctx (depth, nmax) int32 rows valid up to counts[l], padding has
    occ=1 ctx=0 (safe table indices).
    """
    n = leaf.shape[0]
    row = jnp.arange(nmax, dtype=jnp.int32)
    occ_rows_prev = jnp.zeros(n, dtype=jnp.int32)   # root has no parent
    occs, ctxs, counts = [], [], []
    for l in range(depth):
        shift = 3 * (depth - l)
        prefix = leaf >> shift
        first = jnp.concatenate(
            [jnp.ones((1,), bool), prefix[1:] != prefix[:-1]])
        cums = jnp.cumsum(first.astype(jnp.int32))
        seg = cums - 1
        child = ((leaf >> (shift - 3)) & 7).astype(jnp.int32)
        onehot = jax.nn.one_hot(child, 8, dtype=jnp.int32)
        occ_counts = jax.ops.segment_sum(onehot, seg, num_segments=n)
        occ = jnp.sum(
            jnp.where(occ_counts > 0, 1, 0)
            * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=-1)
        occ_rows = occ[seg]                          # leaf-aligned
        if l == 0:
            ctx_rows = jnp.zeros(n, dtype=jnp.int32)
        else:
            child_idx = (prefix & 7).astype(jnp.int32)
            ctx_rows = (child_idx << 8) | occ_rows_prev
        occ_rows_prev = occ_rows
        # compact first-of-segment rows to the front (gather, no scatter)
        cnt = cums[-1]
        src = jnp.searchsorted(
            cums, jnp.arange(1, nmax + 1, dtype=jnp.int32))
        src = jnp.minimum(src, n - 1)
        valid = row < cnt
        occs.append(jnp.where(valid, occ_rows[src], 1))
        ctxs.append(jnp.where(valid, ctx_rows[src], 0))
        counts.append(cnt)
    return (jnp.stack(occs), jnp.stack(ctxs),
            jnp.stack(counts).astype(jnp.int32))


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


def _pack_table(c_full: jnp.ndarray) -> jnp.ndarray:
    """Decoder slot table: slot -> (sym | freq-1 | cumstart) packed i32.

    (N_CTX * M,) int32; entry = sym << 24 | (freq-1) << 12 | cumstart.
    One gather per decoded symbol recovers everything rANS needs.
    """
    slots = jnp.arange(M, dtype=jnp.int32)
    sym = jax.vmap(
        lambda rowc: jnp.searchsorted(rowc, slots, side="right"))(c_full)
    sym = sym.astype(jnp.int32)                      # (N_CTX, M) in 1..255
    hi = jnp.take_along_axis(c_full, sym, axis=1)
    lo = jnp.take_along_axis(c_full, sym - 1, axis=1)
    packed = (sym << 24) | ((hi - lo - 1) << 12) | lo
    return packed.reshape(-1)


def _hist_update(hist, ctx_row, occ_row, count):
    """hist += histogram of level's (ctx, sym) pairs (padding dropped)."""
    nmax = ctx_row.shape[0]
    valid = jnp.arange(nmax, dtype=jnp.int32) < count
    bins = jnp.where(valid, ctx_row * 256 + occ_row, N_CTX * 256)
    upd = jax.ops.segment_sum(
        jnp.ones(nmax, jnp.int32), bins, num_segments=N_CTX * 256 + 1)
    return hist + upd[:-1].reshape(N_CTX, 256)


# =====================================================================
# encode: ONE jitted program
# =====================================================================


@partial(jax.jit, static_argnames=("depth", "nmax", "lanes", "wcap"))
def encode_device(leaf: jnp.ndarray, depth: int, nmax: int,
                  lanes: int = 1024, wcap: int | None = None):
    """Full on-device geometry encode.

    leaf: (n,) sorted unique Morton codes, n <= nmax.
    Returns (payload u8 buffer, used_bytes scalar).  Layout:
      [depth x u32 counts][lanes x u32 lane word counts]
      [lanes x u32 final states][u32 total_words][total_words x u16]
    Only the first `used_bytes` of the buffer are meaningful.
    """
    K = lanes
    if wcap is None:
        # one 16-bit word per emission slot is the hard upper bound
        wcap = (_ceil_div(nmax, K) * depth + depth + 1) * K
    nmax_p = (_ceil_div(nmax, K) + 1) * K
    occ2, ctx2, counts = _analysis(leaf, depth, nmax)

    # ---- forward table pass: per-node (freq, cumstart) --------------
    hist = jnp.zeros((N_CTX, 256), jnp.int32)
    f_rows, c_rows = [], []
    for l in range(depth):
        c_full = _quantize_cfull(hist)
        flat = c_full.reshape(-1)
        ix = ctx2[l] * 256 + occ2[l]
        hi = flat[ix]
        lo = flat[ix - 1]
        f_rows.append(jnp.pad(hi - lo, (0, nmax_p - nmax),
                              constant_values=1))
        c_rows.append(jnp.pad(lo, (0, nmax_p - nmax)))
        hist = _hist_update(hist, ctx2[l], occ2[l], counts[l])
    fN = jnp.stack(f_rows)                           # (depth, nmax_p)
    cN = jnp.stack(c_rows)

    # ---- reverse rANS emission --------------------------------------
    s_cap = _ceil_div(nmax, K) * depth + depth + 1
    lane_ix = jnp.arange(K, dtype=jnp.int32)
    states = jnp.full((K,), RANS_L, jnp.uint32)
    wdense = jnp.zeros((s_cap, K), jnp.int32)
    fdense = jnp.zeros((s_cap, K), bool)
    g = jnp.int32(0)
    for l in range(depth - 1, -1, -1):
        T_l = _ceil_div_j(counts[l], K)
        f_row, c_row = fN[l], cN[l]

        def body(carry, f_row=f_row, c_row=c_row, T_l=T_l,
                 count=counts[l]):
            t, states, g, wdense, fdense = carry
            base = (T_l - 1 - t) * K
            f = jax.lax.dynamic_slice(f_row, (base,), (K,))
            c = jax.lax.dynamic_slice(c_row, (base,), (K,))
            valid = base + lane_ix < count
            f = jnp.where(valid, f, 1).astype(jnp.uint32)
            emit = valid & (states >= (f << 20))
            w16 = (states & 0xFFFF).astype(jnp.int32)
            x = jnp.where(emit, states >> 16, states)
            q = x // f
            r = x - q * f
            nxt = (q << M_BITS) + r + c.astype(jnp.uint32)
            states = jnp.where(valid, nxt, x)
            z = jnp.int32(0)
            wdense = jax.lax.dynamic_update_slice(
                wdense, jnp.where(emit, w16, 0)[None, :], (g, z))
            fdense = jax.lax.dynamic_update_slice(
                fdense, emit[None, :], (g, z))
            return t + 1, states, g + 1, wdense, fdense

        t0 = jnp.int32(0)
        _, states, g, wdense, fdense = jax.lax.while_loop(
            lambda cr, T_l=T_l: cr[0] < T_l, body,
            (t0, states, g, wdense, fdense))

    # ---- per-lane stream compaction (decode-read order) -------------
    # Decode reads each lane's words in reverse emission order: flip
    # rows, transpose to lane-major, one global gather-compaction.
    frev = fdense[::-1]
    wrev = wdense[::-1]
    mflat = frev.T.reshape(-1)
    xflat = wrev.T.reshape(-1)
    cums = jnp.cumsum(mflat.astype(jnp.int32))
    total_words = cums[-1]
    src = jnp.searchsorted(cums, jnp.arange(1, wcap + 1, dtype=jnp.int32))
    src = jnp.minimum(src, mflat.shape[0] - 1)
    words = jnp.where(jnp.arange(wcap) < total_words, xflat[src], 0)
    lane_lens = jnp.sum(fdense, axis=0).astype(jnp.int32)

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
        u32_bytes(counts), u32_bytes(lane_lens), u32_bytes(states),
        u32_bytes(total_words[None]), w_u8])
    used = 4 * (depth + 2 * K + 1) + 2 * total_words
    return buf, used


def _ceil_div_j(a, b):
    return (a + b - 1) // b


# =====================================================================
# decode: ONE jitted program
# =====================================================================


@partial(jax.jit, static_argnames=("depth", "nmax", "lanes"))
def decode_device(counts: jnp.ndarray, lane_lens: jnp.ndarray,
                  states0: jnp.ndarray, words: jnp.ndarray,
                  depth: int, nmax: int, lanes: int = 1024):
    """Full on-device geometry decode.

    counts (depth,) i32, lane_lens (K,) i32, states0 (K,) u32, words
    (wcap,) i32 of u16 values (lane-major concatenated streams).
    Returns (leaf codes (nmax,) i64 padded with I64_MAX, leaf count).
    """
    K = lanes
    nmax_p = (_ceil_div(nmax, K) + 1) * K
    wcap = words.shape[0]
    lane_ix = jnp.arange(K, dtype=jnp.int32)
    row = jnp.arange(nmax, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(lane_lens)])[:K]
    cursors = starts.astype(jnp.int32)
    states = states0
    hist = jnp.zeros((N_CTX, 256), jnp.int32)
    nodes = jnp.full((nmax,), _I64_MAX, jnp.int64).at[0].set(0)
    cnt = jnp.int32(1)
    ctx_row = jnp.zeros((nmax_p,), jnp.int32)
    slots8 = jnp.arange(8, dtype=jnp.int64)

    for l in range(depth):
        pack = _pack_table(_quantize_cfull(hist))
        T_l = _ceil_div_j(counts[l], K)
        syms_buf = jnp.zeros((nmax_p,), jnp.int32)

        def body(carry, T_l=T_l, count=counts[l], ctx_row=ctx_row,
                 pack=pack):
            t, states, cursors, syms_buf = carry
            base = t * K
            valid = base + lane_ix < count
            ctxv = jax.lax.dynamic_slice(ctx_row, (base,), (K,))
            slot = (states & (M - 1)).astype(jnp.int32)
            e = pack[ctxv * M + slot]
            sym = (e >> 24) & 0xFF    # int32 pack: sym>=128 sets the sign bit
            f = ((e >> 12) & (M - 1)).astype(jnp.uint32) + 1
            cs = (e & (M - 1)).astype(jnp.uint32)
            st = f * (states >> M_BITS) + slot.astype(jnp.uint32) - cs
            need = valid & (st < RANS_L)
            w = words[jnp.minimum(cursors, wcap - 1)].astype(jnp.uint32)
            st = jnp.where(need, (st << 16) | w, st)
            states = jnp.where(valid, st, states)
            cursors = cursors + need.astype(jnp.int32)
            syms_buf = jax.lax.dynamic_update_slice(
                syms_buf, jnp.where(valid, sym, 1), (base,))
            return t + 1, states, cursors, syms_buf

        _, states, cursors, syms_buf = jax.lax.while_loop(
            lambda cr, T_l=T_l: cr[0] < T_l, body,
            (jnp.int32(0), states, cursors, syms_buf))

        occ_l = syms_buf[:nmax]
        hist = _hist_update(hist, ctx_row[:nmax], occ_l, counts[l])

        # expand children + next level contexts (gather compaction)
        occ_v = jnp.where(row < counts[l], occ_l, 0).astype(jnp.int64)
        m = (((occ_v[:, None] >> slots8[None, :]) & 1) > 0)
        child = (nodes[:, None] << 3) | slots8[None, :]
        flat_m = m.reshape(-1)
        flat_c = child.reshape(-1)
        cums = jnp.cumsum(flat_m.astype(jnp.int32))
        src = jnp.searchsorted(
            cums, jnp.arange(1, nmax + 1, dtype=jnp.int32))
        src = jnp.minimum(src, 8 * nmax - 1)
        new_cnt = cums[-1]
        valid_n = row < new_cnt
        nodes = jnp.where(valid_n, flat_c[src], _I64_MAX)
        child_ix = (nodes & 7).astype(jnp.int32)
        parent_occ = occ_l[jnp.minimum(src >> 3, nmax - 1)]
        ctx_next = jnp.where(valid_n, (child_ix << 8) | parent_occ, 0)
        ctx_row = jnp.pad(ctx_next, (0, nmax_p - nmax))
        cnt = new_cnt

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
    lane_lens = u8[off:off + 4 * lanes].view("<u4").astype(np.int32)
    off += 4 * lanes
    states = u8[off:off + 4 * lanes].view("<u4")
    off += 4 * lanes
    total_words = int(u8[off:off + 4].view("<u4")[0])
    off += 4
    words = u8[off:off + 2 * total_words].view("<u2").astype(np.int32)
    return counts, lane_lens, states, words


def roundtrip_host(leaf: np.ndarray, depth: int, nmax: int | None = None,
                   lanes: int = 64):
    """Host-callable encode->decode round trip (tests / reference)."""
    leaf = np.asarray(leaf, dtype=np.int64)
    if nmax is None:
        nmax = max(64, leaf.shape[0])
    buf, used = encode_device(jnp.asarray(leaf), depth, nmax, lanes)
    u8 = np.asarray(buf)[:int(used)]
    counts, lane_lens, states, words = parse_payload(u8, depth, lanes)
    wcap = max(64, words.shape[0])
    words_p = np.zeros(wcap, np.int32)
    words_p[:words.shape[0]] = words
    nodes, cnt = decode_device(
        jnp.asarray(counts), jnp.asarray(lane_lens),
        jnp.asarray(states), jnp.asarray(words_p), depth, nmax, lanes)
    return np.asarray(nodes)[:int(cnt)], len(u8)
