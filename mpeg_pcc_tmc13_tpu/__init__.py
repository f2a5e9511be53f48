"""mpeg_pcc_tmc13_tpu — a TPU-native G-PCC (MPEG TMC13) point-cloud codec.

A ground-up re-design of the capabilities of the MPEG G-PCC reference codec
(`MPEGGroup/mpeg-pcc-tmc13`, mounted read-only at /root/reference) for TPU
hardware, built on JAX/XLA/Pallas for the compute path and a thin native C++
stage for entropy coding.

Design stance (see SURVEY.md §7): the reference is a pointer-chasing,
bit-serial single-threaded C++ codec.  This framework inverts the layout:

* every per-point / per-node computation is a **vectorised pass over
  Morton-sorted tensors** (octree levels are breadth-first wavefronts,
  RAHT is a segmented bottom-up butterfly, LoD/KNN is a windowed search
  in Morton order),
* **entropy coding is a two-phase pipeline**: the device computes
  (context-id, symbol) streams per octree level / coefficient block; a
  bit-exact native C++ range coder serialises them on the host,
* context models are designed so that a whole level's context ids are a
  function of *previously decoded levels only*, making decode as
  level-parallel as encode (the reference's same-level causal contexts
  are the single biggest serialisation; we trade a small amount of
  context precision for wavefront parallelism),
* multi-chip scaling shards **slices** (the bitstream-level parallelism
  unit the standard already defines, reference `partitioning.cpp`)
  across a `jax.sharding.Mesh`.

Subpackages
-----------
``utils``      L0: math, Morton codes, PLY I/O, option/config system, timing.
``bitstream``  L1+L3: range coder (native + pure-Python fallback), bit I/O,
               TLV framing, high-level syntax (SPS/GPS/APS/GBH/ABH).
``ops``        device compute passes (octree wavefronts, RAHT, LoD/KNN,
               lifting, trisoup, predictive-tree, motion).
``models``     L5: the codec families (geometry: octree/trisoup/predictive;
               attributes: RAHT/predicting/lifting/raw) + point-set model.
``runtime``    L6/L7: frame codec orchestration, sequence driver, CLI.
``parallel``   slice-parallel sharding over a device mesh.
``native``     C++ host runtime: range coder, octree builder, radix
               sort, chain reconstruction (built on first import).
``tools``      out-of-codec utilities (ply-merge).
"""

from __future__ import annotations

import os
import sys

# The codec is integer/fixed-point throughout (reference FixedPoint.h:44,
# PCCMath.h).  Geometry precision runs to 21 bits/axis => 63-bit Morton
# codes, so 64-bit integer support is required.  jax itself is imported
# lazily: the host-only paths (CLI startup, entropy stage, conformance
# codecs) never pay the ~1.5 s jax import, which would otherwise
# dominate whole-CLI latency on small frames (reference tmc3 starts in
# milliseconds, TMC3.cpp:220).
if "jax" in sys.modules:
    sys.modules["jax"].config.update("jax_enable_x64", True)
else:
    os.environ.setdefault("JAX_ENABLE_X64", "true")

from .version import __version__  # noqa: E402,F401
