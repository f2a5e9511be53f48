"""Prime the persistent XLA cache for bench.py's device fp-RAHT lane.

The lane runs ~30 per-level integer-RAHT programs; through a tunnelled
accelerator each cold compile costs ~30 s, so bench.py skips the lane
unless this script has populated the compilation cache once (it drops
the `attr_lane_primed` marker on success).  Re-run after changing
ops/raht_fp_device.py or the bench frame shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from bench import _colors_for, make_surface_cloud
from mpeg_pcc_tmc13_tpu.utils import jaxcache


def main():
    cache_dir = jaxcache.enable_compile_cache()

    from mpeg_pcc_tmc13_tpu.models import attr_raht as am
    from mpeg_pcc_tmc13_tpu.models import attributes as attr_model
    from mpeg_pcc_tmc13_tpu.bitstream import entropy
    from mpeg_pcc_tmc13_tpu.ops import octree as ops
    from mpeg_pcc_tmc13_tpu.ops import raht_fp_device
    from mpeg_pcc_tmc13_tpu.utils import morton

    depth = 11
    pos = make_surface_cloud(1_000_000, depth)
    codes = np.sort(morton.encode(pos))
    uniq = ops.unique_sorted(codes)
    colors = _colors_for(uniq, depth)
    steps = [am.qp_to_step_q16(22)] * 3

    t0 = time.time()
    dfr = raht_fp_device.DeviceFpRaht(uniq, depth, steps)
    print(f"plan+stage: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    enc = entropy.RangeEncoder()
    actx = attr_model.AttributeContexts()
    dfr.encode(colors, lambda q: enc.zrow_residuals(
        actx.zrow, q.astype(np.int32)))
    payload = enc.get_bytes()
    print(f"encode (compile+run): {time.time() - t0:.1f}s "
          f"{len(payload)} B", flush=True)

    t0 = time.time()
    dec = entropy.RangeDecoder(payload)
    dctx = attr_model.AttributeContexts()
    vals = np.asarray(dfr.decode(
        lambda m: dec.zrow_residuals(dctx.zrow, m, 3), 3))
    print(f"decode (compile+run): {time.time() - t0:.1f}s", flush=True)
    assert vals.shape == (uniq.size, 3)

    with open(os.path.join(cache_dir, "attr_lane_primed"), "w") as f:
        f.write("ok\n")
    print("marker written: attr lane enabled in bench.py", flush=True)


if __name__ == "__main__":
    main()
