"""Persistent XLA compilation cache.

First compile of the DiT-B train step costs 1-4 minutes through the TPU
tunnel; the persistent cache makes every subsequent process start warm.
Called by bench.py, the CLIs, and the graft entry.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DONE = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    if os.environ.get("VAW_DISABLE_JAX_CACHE"):
        _DONE = True
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VAW_JAX_CACHE", os.path.expanduser("~/.cache/vaw_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older jax flag names; cache is optional
        pass
    _DONE = True
