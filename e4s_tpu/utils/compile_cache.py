"""Persistent XLA compilation cache setup.

The full training step (generator + encoder + 4 aux loss nets, forward +
backward, 8-way SPMD) takes minutes to compile on the CPU backend; the
persistent cache makes repeated dryruns/tests/benches near-instant.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/e4s_tpu_xla")


def enable_compile_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("E4S_TPU_NO_CACHE"):
        return
    import jax

    # CPU-backend caching is DISABLED: XLA:CPU AOT cache entries written with
    # mismatched machine-feature sets (+prefer-no-scatter/-gather) reload with
    # "may SIGILL" warnings and have produced real SIGABRTs mid-suite here.
    # The cache is only a compile-time optimisation on the TPU backend.
    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return

    cache_dir = cache_dir or os.environ.get("E4S_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
