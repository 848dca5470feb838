"""Worker process for the 2-process CPU multi-host smoke test.

Launched by tests/test_multihost.py with the GENOMAD_TPU_* coordinator
environment set. Each process contributes 2 virtual CPU devices; after
``initialize_distributed()`` the global mesh spans 4 devices across both
processes (the CPU stand-in for a pod slice, SURVEY §2.5/§5.8). Runs the
PRODUCTION sharded search (prefilter -> (data, db)-sharded SW program with
all-gathered stats) and writes its hit table as JSON to argv[1].
"""

import json
import sys
from pathlib import Path

# PYTHONPATH must stay unset (it breaks TPU-plugin backend discovery), so
# the repo root is inserted here, as the tools/ scripts do.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    # this environment ignores JAX_PLATFORMS; the config update is the
    # reliable way to pin the CPU backend
    jax.config.update("jax_platforms", "cpu")

    from genomad_tpu.parallel import mesh as meshlib

    assert meshlib.initialize_distributed(), "coordinator env not detected"
    assert jax.process_count() == 2, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4, f"global mesh should span 4 devices: {devices}"
    n_data, n_db = meshlib.balanced_factorization(len(devices))
    mesh = meshlib.make_mesh(n_data=n_data, n_db=n_db, devices=devices)

    import numpy as np

    from genomad_tpu.ops import protein_search
    from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB

    # >256 profiles + integral scores: the production prefiltered branch
    db = ProfileDB.synthetic(
        seed=4, n_profiles=300, min_len=40, max_len=120, integral=True
    )
    rng = np.random.default_rng(5)
    names, seqs = [], []
    for qi in range(8):
        seq = db.consensus(int(rng.integers(0, db.n_profiles))).copy()
        pos = rng.choice(len(seq), max(1, len(seq) // 10), replace=False)
        seq[pos] = rng.integers(0, N_AA, len(pos))
        names.append(f"q{qi}")
        seqs.append("".join(ALPHABET[r] for r in seq))

    hits = protein_search.search(names, seqs, db, mesh=mesh)
    with open(sys.argv[1], "w") as f:
        json.dump({q: list(v) for q, v in hits.items()}, f, sort_keys=True)


if __name__ == "__main__":
    main()
