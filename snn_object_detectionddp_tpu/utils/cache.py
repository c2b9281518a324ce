"""Persistent XLA compilation cache.

TPU compiles through the tunneled device take minutes; caching them on disk
makes every second run of the CLI / tests / bench start hot. Enabled by all
entry points; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SNN_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/snn_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
