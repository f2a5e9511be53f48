"""Cross-backend bit-identity and roundtrip tests for the range coder.

The pure-Python implementation is the executable spec; the native C++
library must produce byte-identical streams and decode them identically
(analogous to the reference's reliance on schroarith bit-exactness,
SURVEY.md §4)."""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy as E


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(42)
    return dict(
        ctx_ids=rng.integers(0, 16, 3000).astype(np.int32),
        bits=(rng.random(3000) < 0.2).astype(np.uint8),
        occ_base=rng.integers(0, 12, 1500).astype(np.int32),
        occ=rng.integers(1, 256, 1500).astype(np.uint8),
        vals=rng.integers(0, 500, 800).astype(np.uint32),
        res=(rng.standard_normal(2000) * 5).astype(np.int32),
        nbits=rng.integers(1, 17, 800).astype(np.int32),
    )


def _encode(force, p):
    ctx = E.new_contexts(16)
    ctx2 = E.new_contexts(12 * 255)
    ctx3 = E.new_contexts(32)
    ctx4 = E.new_contexts(32)
    e = E.RangeEncoder(force_python=force)
    e.bits(ctx, p["ctx_ids"], p["bits"])
    e.occupancy(ctx2, p["occ_base"], p["occ"])
    e.ueg(ctx3, np.zeros(len(p["vals"]), np.int32), p["vals"], 8, 2)
    e.residuals(ctx4, p["res"], 12, 1)
    e.bypass(p["vals"], p["nbits"])
    return e.get_bytes(), (ctx, ctx2, ctx3, ctx4)


def _decode(force, data, p):
    ctx = E.new_contexts(16)
    ctx2 = E.new_contexts(12 * 255)
    ctx3 = E.new_contexts(32)
    ctx4 = E.new_contexts(32)
    d = E.RangeDecoder(data, force_python=force)
    assert np.array_equal(d.bits(ctx, p["ctx_ids"]), p["bits"])
    assert np.array_equal(d.occupancy(ctx2, p["occ_base"]), p["occ"])
    assert np.array_equal(
        d.ueg(ctx3, np.zeros(len(p["vals"]), np.int32), 8, 2), p["vals"])
    assert np.array_equal(d.residuals(ctx4, len(p["res"]), 12, 1), p["res"])
    masked = p["vals"] & ((1 << p["nbits"].astype(np.uint32)) - 1)
    assert np.array_equal(d.bypass(p["nbits"]), masked)
    return ctx, ctx2, ctx3, ctx4


def test_python_roundtrip(payload):
    data, enc_ctx = _encode(True, payload)
    dec_ctx = _decode(True, data, payload)
    for a, b in zip(enc_ctx, dec_ctx):
        assert np.array_equal(a, b)  # enc/dec context evolution identical


@pytest.mark.skipif(not E.native_available(), reason="native lib missing")
def test_native_matches_python(payload):
    d_native, _ = _encode(False, payload)
    d_py, _ = _encode(True, payload)
    assert d_native == d_py
    _decode(False, d_py, payload)
    _decode(True, d_native, payload)


def test_compression_adapts():
    # heavily biased bits should compress far below 1 bit/bin
    bits = np.zeros(10000, dtype=np.uint8)
    bits[::97] = 1
    ctx = E.new_contexts(1)
    e = E.RangeEncoder()
    e.bits(ctx, np.zeros(10000, np.int32), bits)
    n = len(e.get_bytes())
    assert n < 10000 / 8 / 4  # at least 4x under bypass cost


def test_empty_stream():
    e = E.RangeEncoder()
    data = e.get_bytes()
    d = E.RangeDecoder(data)
    assert np.array_equal(d.bits(E.new_contexts(1), np.array([], np.int32)),
                          np.array([], np.uint8))


# ---- sparse zero-run and joint row coders ---------------------------

def _sparse_vals(rng, n, density, lo=1, hi=40):
    v = np.zeros(n, dtype=np.int32)
    nz = rng.random(n) < density
    v[nz] = rng.integers(lo, hi, int(nz.sum())) * \
        rng.choice([-1, 1], int(nz.sum()))
    return v


@pytest.mark.parametrize("density", [0.0, 0.003, 0.2, 1.0])
def test_zrun_cross_engine(density):
    rng = np.random.default_rng(int(density * 1000) + 7)
    vals = _sparse_vals(rng, 5000, density)
    outs = []
    for force in (True, False):
        ctx = E.new_contexts(40)
        e = E.RangeEncoder(force_python=force)
        e.zrun_residuals(ctx, vals, 3, 2)
        outs.append(e.get_bytes())
    assert outs[0] == outs[1]
    for force in (True, False):
        ctx = E.new_contexts(40)
        d = E.RangeDecoder(outs[0], force_python=force)
        assert np.array_equal(d.zrun_residuals(ctx, len(vals), 3, 2),
                              vals)


@pytest.mark.parametrize("ncomp", [1, 3])
@pytest.mark.parametrize("density", [0.0, 0.004, 0.3])
def test_zrow_cross_engine(ncomp, density):
    rng = np.random.default_rng(ncomp * 100 + int(density * 1000))
    rows = np.zeros((4000, ncomp), dtype=np.int32)
    nz = rng.random(4000) < density
    k = int(nz.sum())
    if k:
        mags = rng.integers(0, 30, (k, ncomp))
        # guarantee the row is nonzero
        mags[np.arange(k), rng.integers(0, ncomp, k)] += 1
        rows[nz] = mags * rng.choice([-1, 1], (k, ncomp))
    outs = []
    for force in (True, False):
        ctx = E.new_contexts(31)
        e = E.RangeEncoder(force_python=force)
        e.zrow_residuals(ctx, rows)
        outs.append(e.get_bytes())
    assert outs[0] == outs[1]
    for force in (True, False):
        ctx = E.new_contexts(31)
        d = E.RangeDecoder(outs[0], force_python=force)
        assert np.array_equal(
            d.zrow_residuals(ctx, rows.shape[0], ncomp), rows)


def test_zrow_sparser_beats_flags():
    """The run coder must make long zero deserts nearly free."""
    rng = np.random.default_rng(3)
    vals = _sparse_vals(rng, 200_000, 0.0005)
    ctx = E.new_contexts(40)
    e = E.RangeEncoder()
    e.zrun_residuals(ctx, vals, 3, 2)
    zrun_bytes = len(e.get_bytes())
    ctx = E.new_contexts(40)
    e = E.RangeEncoder()
    e.residuals(ctx, vals, 3, 2)
    flag_bytes = len(e.get_bytes())
    assert zrun_bytes < flag_bytes * 0.75


def test_trisoup_verts2_native_matches_spec():
    """v2 trisoup vertex coder: native C++ and the pure-Python spec
    must emit identical bytes and decode identically."""
    import numpy as np
    from mpeg_pcc_tmc13_tpu.bitstream import entropy
    if not entropy.native_available():
        return
    rng = np.random.default_rng(3)
    ne, nbits = 400, 4
    pres = (rng.random(ne) < 0.4).astype(np.uint8)
    vpos = rng.integers(0, 1 << nbits, ne).astype(np.int32)
    vpos[pres == 0] = 0
    order = rng.permutation(ne).astype(np.int64)
    rank = np.empty(ne, dtype=np.int64)
    rank[order] = np.arange(ne)
    nbr = rng.integers(-1, ne, (ne, 9)).astype(np.int32)
    # only lower-rank neighbours are legal references
    bad = (nbr >= 0) & (rank[np.maximum(nbr, 0)] >= rank[:, None])
    nbr[bad] = -1
    orient = np.full(ne, 0b10101010, dtype=np.uint16)
    cmult = rng.integers(1, 5, ne).astype(np.uint8)
    nbef = rng.integers(0, 5, ne).astype(np.uint8)
    naft = rng.integers(0, 5, ne).astype(np.uint8)
    dirn = rng.integers(0, 3, ne).astype(np.uint8)

    streams = {}
    for cls in (entropy.RangeEncoder, entropy._NativeEncoder):
        ctx = entropy.new_contexts(704)
        enc = cls() if cls is not entropy.RangeEncoder else cls(
            force_python=True)
        enc.trisoup_verts2(ctx, pres, vpos, order, nbr, orient, cmult,
                           nbef, naft, dirn, nbits)
        streams[cls.__name__] = enc.get_bytes()
    vals = list(streams.values())
    assert vals[0] == vals[1]

    dec = entropy.RangeDecoder(vals[0])
    ctx = entropy.new_contexts(704)
    p2, v2 = dec.trisoup_verts2(ctx, order, nbr, orient, cmult, nbef,
                                naft, dirn, ne, nbits)
    np.testing.assert_array_equal(p2, pres)
    np.testing.assert_array_equal(v2, vpos)
