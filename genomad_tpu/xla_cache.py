"""Persistent XLA compilation cache.

The pipeline compiles a few dozen fixed-shape programs (SW buckets, the
IGLOO forward, fusion heads). Caching them on disk makes every process
after the first start hot — without this, each CLI invocation pays
~1-2 s per program shape on TPU.

Importing this module is enough; the cache dir is only set when the
embedding process hasn't already chosen one (e.g. tests/conftest.py or
bench.py set their own).
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.environ.get(
    "GENOMAD_TPU_JAX_CACHE", os.path.expanduser("~/.cache/genomad_tpu/jax")
)


def ensure_cache() -> None:
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", _DEFAULT)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # config API drift or read-only fs: cache is optional
        pass


ensure_cache()
