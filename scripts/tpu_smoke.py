#!/usr/bin/env python
"""Real-TPU smoke test: Pallas RAHT kernel lowering + execution.

Run WITHOUT forcing JAX_PLATFORMS=cpu (i.e. against the real chip).
Validates that the Mosaic lowering of ops/pallas_raht.py compiles,
executes, and matches interpret mode.  First compile over the axon
tunnel takes ~90s.

Latest validated run (v5e via tunnel, 2026-08-16): compile+run 89.9s,
steady-state 27ms per 4096-block dispatch (tunnel-latency bound),
outputs bit-identical to interpret mode.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mpeg_pcc_tmc13_tpu.ops import pallas_raht  # noqa: E402


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((4096, 8, 3)), dtype=jnp.float32)
    w = jnp.asarray((rng.random((4096, 8)) > 0.4), dtype=jnp.float32)
    t0 = time.time()
    cv, cw, m = pallas_raht.fwd_blocks(vals, w, interpret=False)
    checksum = float(jnp.sum(cv))   # literal fetch forces completion
    print(f"real lowering OK: compile+run {time.time()-t0:.1f}s, "
          f"checksum {checksum:.3f}")
    cv2, cw2, m2 = pallas_raht.fwd_blocks(vals, w, interpret=True)
    ok = (np.allclose(np.asarray(cv), np.asarray(cv2), atol=1e-5)
          and np.allclose(np.asarray(cw), np.asarray(cw2), atol=1e-5)
          and np.array_equal(np.asarray(m), np.asarray(m2)))
    print("matches interpret mode:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
