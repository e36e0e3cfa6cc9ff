"""Persistent XLA compilation cache wiring.

The incremental/online engine's only real cost on TPU is compilation when
array shapes change (core/online.py design note) — and through a
remote-compile TPU backend that cost is minutes for the first solve of a
session (BENCH_r03 measured 154 s cold vs 2.9 s warm on the intel replay).
JAX's persistent compilation cache serializes executables to disk keyed on
the HLO, so every session after the first starts warm; probed working
through the axon remote backend (round 4: 0.65 s -> 0.09 s on a
representative program).

Enabled by default by OnlineOptimizer and the CLI; callers who set
jax_compilation_cache_dir themselves are left alone.
"""
from __future__ import annotations

import os

__all__ = ["enable_persistent_cache", "default_cache_dir"]

_ENABLED = False


def default_cache_dir() -> str:
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "openslam_g2o_tpu", "xla_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point the JAX persistent compilation cache at `path` (default: the
    user cache dir). No-op if the user already configured a cache dir or
    if the directory cannot be created. Returns the active dir or None."""
    global _ENABLED
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    if _ENABLED:
        return None
    # only worth it (and only clean) for remote/accelerator backends: CPU
    # compiles are fast, and XLA:CPU AOT reloads warn about machine-feature
    # mismatches (+prefer-no-scatter et al.) on every load
    try:
        if all(d.platform == "cpu" for d in jax.devices()):
            return None
    except RuntimeError:
        return None
    path = path or default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every executable: the online path's programs are exactly the
    # small-but-slow-to-compile kind the default thresholds skip
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _ENABLED = True
    return path
