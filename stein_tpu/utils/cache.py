"""Persistent XLA compilation cache.

On this environment compiles dominate short runs (remote Mosaic/XLA
compiles cost minutes) — the persistent cache makes every re-run of an
already-compiled program start in seconds. Call once before building
samplers; safe to call multiple times."""

import os

import jax


def enable_compilation_cache(path="/tmp/stein_tpu_xla_cache",
                             min_compile_secs=1.0):
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return path
