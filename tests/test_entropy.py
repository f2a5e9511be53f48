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
