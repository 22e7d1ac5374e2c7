"""Persistent XLA compilation cache shared by every app/script.

The fused clip programs and train steps take 20-40 s each to compile
through the dev tunnel; gate/bench pipelines re-invoke the apps as fresh
processes (and retry after tunnel hangs), so without a persistent cache
every retry pays full recompilation. One on-disk cache at
``<repo>/.jax_cache`` makes identical programs compile once per machine.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotent; call after ``import jax`` and before the first jit."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: compile-every-time, not fatal
