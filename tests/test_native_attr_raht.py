"""Native predicted-RAHT engine (native/attr_raht.cc) byte-identity.

The C++ engine mirrors the numpy spec (ops/raht.py forward_predicted +
models/attr_raht.py quant/RDOQ) op-for-op in IEEE double, so its zrow
stream must be byte-identical to the Python path and either side must
decode the other.  Counterpart of the reference uraht_process
(RAHT.cpp:977) speed path.
"""

import numpy as np
import pytest

from mpeg_pcc_tmc13_tpu.bitstream import entropy
from mpeg_pcc_tmc13_tpu.bitstream.hls import (
    AttributeBrickHeader, AttributeDescription, AttributeParameterSet)
from mpeg_pcc_tmc13_tpu.models import attr_raht
from mpeg_pcc_tmc13_tpu.models.attributes import AttributeContexts
from mpeg_pcc_tmc13_tpu.utils import morton

pytestmark = pytest.mark.skipif(
    entropy._LIB is None, reason="native library not built")


def _cloud(n, extent, seed, ncomp=3, noise=40):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, extent, size=(n, 3)).astype(np.int64)
    order = np.argsort(morton.encode(pos), kind="stable")
    pos = pos[order]
    base = (pos @ np.array([3, 5, 7]))[:, None]
    vals = (base * np.arange(1, ncomp + 1)
            + rng.integers(0, noise, size=(n, ncomp))) % 256
    return pos, vals.astype(np.int64)


def _roundtrip(pos, vals, aps, desc, abh=None):
    """Encode+decode native and numpy; assert identical streams and
    cross-path decodes."""
    import mpeg_pcc_tmc13_tpu.models.attr_raht as m
    c1, c2 = AttributeContexts(), AttributeContexts()
    b_nat = attr_raht.encode(vals, pos, aps, desc, c1, abh=abh)
    orig = m._native_fastpath_ok
    m._native_fastpath_ok = lambda *a: False
    try:
        b_py = attr_raht.encode(vals, pos, aps, desc, c2, abh=abh)
        d_py = attr_raht.decode(b_nat, pos, aps, desc,
                                AttributeContexts(), abh=abh)
    finally:
        m._native_fastpath_ok = orig
    assert b_nat == b_py
    assert np.array_equal(c1.zrow, c2.zrow)
    d_nat = attr_raht.decode(b_nat, pos, aps, desc,
                             AttributeContexts(), abh=abh)
    assert np.array_equal(d_nat, d_py)
    return b_nat, d_nat


@pytest.mark.parametrize("qp", [10, 22, 34, 46])
def test_byte_identity_qps(qp):
    pos, vals = _cloud(4000, 128, qp)
    aps = AttributeParameterSet(init_qp=qp, raht_prediction_enabled=True)
    desc = AttributeDescription(num_components=3, bitdepth=8)
    _roundtrip(pos, vals, aps, desc)


def test_byte_identity_mono():
    pos, vals = _cloud(3000, 64, 5, ncomp=1)
    aps = AttributeParameterSet(init_qp=30, raht_prediction_enabled=True)
    desc = AttributeDescription(num_components=1, bitdepth=8)
    b, d = _roundtrip(pos, vals[:, 0], aps, desc)
    assert d.ndim == 1


def test_byte_identity_with_duplicates():
    pos, vals = _cloud(3000, 24, 6)   # small extent -> many duplicates
    aps = AttributeParameterSet(init_qp=28, raht_prediction_enabled=True)
    desc = AttributeDescription(num_components=3, bitdepth=8)
    _roundtrip(pos, vals, aps, desc)


def test_byte_identity_abh_slice_qp_delta():
    """Slice-level qp_delta folds into the constant step: still the
    fast path, still identical."""
    pos, vals = _cloud(2500, 64, 7)
    aps = AttributeParameterSet(init_qp=34, raht_prediction_enabled=True)
    desc = AttributeDescription(num_components=3, bitdepth=8)
    abh = AttributeBrickHeader(qp_delta=4, qp_delta_chroma=-2)
    _roundtrip(pos, vals, aps, desc, abh=abh)


def test_layer_deltas_fall_back_but_interoperate():
    """Per-layer QP deltas disable the native path; a native-encoded
    stream from a no-delta config must still decode through numpy."""
    import mpeg_pcc_tmc13_tpu.models.attr_raht as m
    pos, vals = _cloud(2500, 64, 8)
    aps = AttributeParameterSet(init_qp=34, raht_prediction_enabled=True)
    desc = AttributeDescription(num_components=3, bitdepth=8)
    abh = AttributeBrickHeader(layer_qp_deltas_luma=[0, 2, 4])
    assert not m._native_fastpath_ok(
        entropy.RangeEncoder(), aps, abh, False, 3, [65536] * 3)
