"""Persistent XLA compilation cache (VERDICT round-2 directive #5).

The reference pays zero compile time (AOT C++); our jitted programs pay
~30-40 s per program cold at reddit scale and minutes at 4x+ (docs/PERF.md).
The persistent cache makes every warm RESTART pay only cache-lookup seconds —
the amortization story a framework needs. Enabled by default in bench.py and
the CLI (``--compilation-cache`` flag; '' disables)."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None) -> None:
    """Must run before the first jax computation. Pass '' / None to disable."""
    if not cache_dir:
        return
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
