"""Version banner (reference: tmc3/version.cpp prints a banner at startup,
TMC3.cpp:223)."""

__version__ = "0.1.0"

# Bitstream magic/version for this codec's native stream format ("GT" =
# G-PCC TPU).  The TLV payload layout follows the reference's framing
# (io_tlv.cpp) but the payload syntax is this codec's own: the entropy
# layer is a re-designed level-parallel context model (see
# bitstream/entropy.py), so streams are NOT interchangeable with tmc3 yet.
BITSTREAM_VERSION = 1
