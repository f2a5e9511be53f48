"""Persistent XLA compilation cache.

Compilation dominates cold-start on remote/tunnelled accelerators (a
trivial jit costs ~12 s through the axon tunnel vs 0.3 s warm), so
every entry point that touches the device enables the on-disk cache.
The cache key is the serialized HLO + compile options + backend
version, so entries are reused across processes and sessions on the
same rig; stale entries for other backends are simply never hit.

The reference has no analogue (single-process CPU codec); this is
accelerator-runtime plumbing in the spirit of its cmake build caching.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently point JAX at the on-disk compilation cache.

    Honoured before the first compilation; safe to call any time.
    Returns the cache directory (honours $MPEG_PCC_JAX_CACHE)."""
    import jax

    cache_dir = path or os.environ.get("MPEG_PCC_JAX_CACHE",
                                       _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          0)
    except Exception:
        pass            # older jax without these knobs: best effort
    return cache_dir
