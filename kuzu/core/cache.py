"""Persistent XLA compilation cache setup.

Compiles through the remote tunnel cost 20–240 s for the big models; the
on-disk cache makes every repeat process start instantly. Enabled by kuzu's
entry points (CLI, bench, serve, graft); opt out with KUZU_NO_COMPILE_CACHE.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("KUZU_NO_COMPILE_CACHE"):
        return
    import jax

    path = (
        cache_dir
        or os.environ.get("KUZU_COMPILE_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "kuzu", "xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: silently skip
        pass
