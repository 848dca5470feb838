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
from genomad_tpu.ops.profiledb import ProfileDB
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


# ---------------------------------------------------------------------------
# Shared synthetic-database fixture (annotate / find-proviruses / e2e tests)
# ---------------------------------------------------------------------------

_METADATA_HEADER = "\t".join(
    ["marker", "c1", "class", "c3", "spm_c", "spm_p", "spm_v", "gv",
     "uscg", "ph", "vh", "conjscan", "amr", "acc", "desc", "t1", "t2"]
)


@pytest.fixture
def synthetic_db_dir(tmp_path):
    """A complete synthetic geNomad DB directory: packed profiles, marker
    metadata, and a minimal taxdump."""
    db_dir = tmp_path / "genomad_db"
    db_dir.mkdir()
    (db_dir / "version.txt").write_text("1.9\n")
    db = ProfileDB.synthetic(seed=17, n_profiles=40, min_len=60, max_len=120)
    # attach taxids: profile 7 -> Caudoviricetes (40)
    db.taxids[:] = 0
    db.taxids[7] = 40
    db.save(db_dir / "genomad_profiles.npz")
    db.save(db_dir / "genomad_mini_profiles.npz")
    ProfileDB.synthetic(seed=99, n_profiles=4, min_len=60, max_len=90).save(
        db_dir / "genomad_integrase_profiles.npz"
    )
    with open(db_dir / "genomad_marker_metadata.tsv", "w") as f:
        f.write(_METADATA_HEADER + "\n")
        for i, name in enumerate(db.names):
            spec = "VV" if i % 2 else "CC"
            spm = ("0.1", "0.2", "0.9") if i % 2 else ("0.9", "0.2", "0.1")
            hallmark_v = 1 if i % 2 else 0
            f.write(
                f"{name}\tx\t{spec}\tx\t{spm[0]}\t{spm[1]}\t{spm[2]}\t0\tNA\t0\t"
                f"{hallmark_v}\tNA\tNA\tPF{i:05d}\tdesc{i}\tx\tx\n"
            )
    with open(db_dir / "nodes.dmp", "w") as f:
        for t, p, r in [(1, 1, "no rank"), (10, 1, "realm"), (20, 10, "kingdom"),
                        (30, 20, "phylum"), (40, 30, "class")]:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(db_dir / "names.dmp", "w") as f:
        for t, n in [(1, "root"), (10, "Duplodnaviria"), (20, "Heunggongvirae"),
                     (30, "Uroviricota"), (40, "Caudoviricetes")]:
            f.write(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n")
    return db_dir, db
