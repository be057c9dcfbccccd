"""Persistent XLA compilation cache for entry points.

Large-model compiles (wav2vec2-large: ~3.5 min) should be paid once per
machine, not once per process.  Entry points (train/serve/extract CLIs,
bench) call :func:`enable_persistent_cache` before their first JAX use;
library code never touches it.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "MMER_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mmer_tpu",
                     "jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
