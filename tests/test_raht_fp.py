"""Fixed-point RAHT: the three backends must agree bit-for-bit.

ops/raht_fp.py (numpy spec) vs native/attr_raht.cc raht_*_fp vs
ops/raht_fp_device.py (JAX) — all integer ops, so the quantised
coefficient stream is identical from any of them, and the APS
raht_fixed_point mode round-trips regardless of which backend coded
it.  RD must track the float mode to within the Q13/Q15 rounding
noise.  Counterpart of the reference's own fixed-point stance
(FixedPoint.h s15.15, RAHT.cpp:672-737).
"""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.bitstream.hls import (AttributeDescription,
                                              AttributeParameterSet)
from mpeg_pcc_tmc13_tpu.models import attr_raht
from mpeg_pcc_tmc13_tpu.models.attributes import AttributeContexts
from mpeg_pcc_tmc13_tpu.ops import raht_fp
from mpeg_pcc_tmc13_tpu.utils import morton


def _cloud(n, extent, seed, ncomp=3):
    rng = np.random.default_rng(seed)
    pos = np.unique(rng.integers(0, extent, (n, 3)).astype(np.int64),
                    axis=0)
    pos = pos[np.argsort(morton.encode(pos), kind="stable")]
    base = (pos @ np.array([3, 5, 7]))[:, None]
    vals = ((base * np.arange(1, ncomp + 1)
             + rng.integers(0, 40, (pos.shape[0], ncomp))) % 256)
    return pos, vals.astype(np.int64)


@pytest.mark.parametrize("qp", [10, 22, 34])
def test_fp_roundtrip_and_rd_parity(qp):
    pos, vals = _cloud(5000, 128, qp)
    desc = AttributeDescription(num_components=3, bitdepth=8)
    aps = AttributeParameterSet(init_qp=qp, raht_prediction_enabled=True,
                                raht_fixed_point=True)
    b = attr_raht.encode(vals, pos, aps, desc, AttributeContexts())
    d = attr_raht.decode(b, pos, aps, desc, AttributeContexts())
    aps_f = AttributeParameterSet(init_qp=qp,
                                  raht_prediction_enabled=True)
    b_f = attr_raht.encode(vals, pos, aps_f, desc, AttributeContexts())
    d_f = attr_raht.decode(b_f, pos, aps_f, desc, AttributeContexts())
    # size within 2% of the float mode, distortion comparable
    assert abs(len(b) - len(b_f)) <= max(0.02 * len(b_f), 64)
    mae = np.abs(d - vals).mean()
    mae_f = np.abs(d_f - vals).mean()
    assert mae <= mae_f + 0.25


@pytest.mark.skipif(entropy._LIB is None, reason="no native lib")
@pytest.mark.parametrize("ncomp,qp", [(3, 22), (1, 30), (3, 40)])
def test_fp_native_byte_identity(ncomp, qp):
    import mpeg_pcc_tmc13_tpu.models.attr_raht as m
    pos, vals = _cloud(4000, 64, qp, ncomp=ncomp)
    if ncomp == 1:
        vals = vals[:, 0]
    desc = AttributeDescription(num_components=ncomp, bitdepth=8)
    aps = AttributeParameterSet(init_qp=qp, raht_prediction_enabled=True,
                                raht_fixed_point=True)
    b_nat = attr_raht.encode(vals, pos, aps, desc, AttributeContexts())
    orig = m._native_fastpath_ok
    m._native_fastpath_ok = lambda *a: False
    try:
        b_py = attr_raht.encode(vals, pos, aps, desc,
                                AttributeContexts())
        d_py = attr_raht.decode(b_nat, pos, aps, desc,
                                AttributeContexts())
    finally:
        m._native_fastpath_ok = orig
    d_nat = attr_raht.decode(b_nat, pos, aps, desc, AttributeContexts())
    assert b_nat == b_py
    assert np.array_equal(d_nat, d_py)


def test_fp_device_q_stream_identity():
    """Device (JAX) closed loop vs the numpy spec: identical quantised
    rows in identical order, and the device decode reproduces the
    numpy decode exactly."""
    from mpeg_pcc_tmc13_tpu.ops import raht_fp_device
    pos, vals = _cloud(4000, 64, 9)
    codes = morton.encode(pos)
    depth = 6
    steps = [13000, 17000, 17000]

    ref_qs = []
    raht_fp.forward_predicted_fp(
        codes, vals, depth, lambda c, tag: steps[c],
        emit=lambda q, tag: ref_qs.append(np.asarray(q, np.int32)))

    dev_qs = []
    dv = raht_fp_device.DeviceFpRaht(codes, depth, steps)
    dv.encode(vals, lambda q: dev_qs.append(q))
    assert len(ref_qs) == len(dev_qs)
    for a, b in zip(ref_qs, dev_qs):
        assert np.array_equal(a, b)

    it = iter(ref_qs)
    dec_dev = np.asarray(dv.decode(lambda m: next(it), 3))
    it2 = iter(ref_qs)
    dec_ref = raht_fp.inverse_predicted_fp(
        codes, depth, lambda m, tag: next(it2).astype(np.int64),
        lambda c, tag: steps[c], 3)
    assert np.array_equal(dec_dev, dec_ref)


def test_fp_aps_flag_round_trips():
    aps = AttributeParameterSet(init_qp=28, raht_fixed_point=True)
    data = aps.write()
    back = AttributeParameterSet.parse(data)
    assert back.raht_fixed_point
