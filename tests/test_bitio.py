import numpy as np

from mpeg_pcc_tmc13_tpu.bitstream.bitio import BitReader, BitWriter


def test_un_roundtrip():
    bw = BitWriter()
    vals = [(5, 3), (0, 1), (1, 1), (1023, 10), (0xDEADBEEF, 32), (7, 3)]
    for v, n in vals:
        bw.write(v, n)
    bw.byte_align()
    br = BitReader(bw.get_bytes())
    for v, n in vals:
        assert br.read(n) == v


def test_ue_se_roundtrip():
    rng = np.random.default_rng(0)
    ue_vals = list(rng.integers(0, 100000, 200)) + [0, 1, 2, 3, 255]
    se_vals = list(rng.integers(-50000, 50000, 200)) + [0, 1, -1, 2, -2]
    bw = BitWriter()
    for v in ue_vals:
        bw.write_ue(int(v))
    for v in se_vals:
        bw.write_se(int(v))
    bw.byte_align()
    br = BitReader(bw.get_bytes())
    for v in ue_vals:
        assert br.read_ue() == v
    for v in se_vals:
        assert br.read_se() == v


def test_ue_codeword_lengths():
    # ue(0) = "1" (1 bit), ue(1) = "010" (3 bits), ue(2) = "011"
    bw = BitWriter()
    bw.write_ue(0)
    bw.byte_align()
    assert bw.get_bytes() == b"\x80"
