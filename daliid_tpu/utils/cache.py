"""Persistent XLA compilation cache.

Compiles through this harness's remote-compile tunnel take minutes; the
on-disk compilation cache makes every repeated jit (bench runs, CLI
restarts, driver checks) hit warm. Call once before heavy jit use.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get("DALIID_JAX_CACHE", "/root/repo/.jax_cache")


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, including fast compiles
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
