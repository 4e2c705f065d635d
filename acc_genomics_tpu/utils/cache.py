"""Persistent XLA compile cache shared by bench.py, the drivers, and
the A/B harnesses.

The machine bodies and Pallas kernels are multi-minute cold compiles on
the dev tunnel; the cache makes every entry point after the first warm.
Call before the first device use.  Safe to call more than once, and a
no-op on jax builds without the knobs.
"""

from __future__ import annotations

import os


def enable_persistent_cache(root: str | None = None) -> str | None:
    """Point jax's compilation cache at <repo>/.jax_cache (or ``root``).

    Returns the cache dir, or None if the jax build lacks the config.
    """
    import jax

    if root is None:
        # utils/cache.py -> utils -> acc_genomics_tpu -> repo root
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    cache_dir = os.path.join(root, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None  # older jax: cold compiles only
    return cache_dir
