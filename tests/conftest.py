"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharded code
paths (data-parallel NN, DB-sharded search) are exercised deterministically
without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon site hook may import jax before this conftest runs, in which case
# the env var above is too late — override via the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the full-size IGLOO forward is compiled once
# across the whole suite (and across runs) instead of per test.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_fasta(tmp_path):
    """Write a small deterministic FASTA file and return its path."""

    def _write(records, name="input.fna"):
        path = tmp_path / name
        with open(path, "w") as f:
            for header, seq in records:
                f.write(f">{header}\n{seq}\n")
        return path

    return _write
