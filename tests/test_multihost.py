"""Multi-host execution smoke test: 2 OS processes, a real
``jax.distributed`` coordinator, a global (data, db) mesh spanning both,
and the production sharded search — asserted identical across processes
and against the single-process reference (VERDICT r3 #3; replaces the
reference's process-pool/--splits machinery, genomad/mmseqs2.py:83-95)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_multihost_search(tmp_path):
    port = _free_port()
    procs, outs, logs = [], [], []
    for pid in range(2):
        env = os.environ.copy()
        env.pop("PYTHONPATH", None)  # breaks backend plugin discovery
        env.update(
            GENOMAD_TPU_MULTIHOST="1",
            GENOMAD_TPU_COORDINATOR=f"localhost:{port}",
            GENOMAD_TPU_NUM_PROCESSES="2",
            GENOMAD_TPU_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        out = tmp_path / f"hits_{pid}.json"
        log = open(tmp_path / f"worker_{pid}.log", "w")
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
                 str(out)],
                env=env, cwd=REPO, stdout=log, stderr=log,
            )
        )
        outs.append(out)
        logs.append(log)
    try:
        for p in procs:
            rc = p.wait(timeout=600)
            assert rc == 0, (
                f"worker failed (rc={rc}):\n"
                + "\n".join((tmp_path / f"worker_{i}.log").read_text()[-4000:]
                            for i in range(2))
            )
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    hits = [json.loads(out.read_text()) for out in outs]
    # both processes hold the identical global result
    assert hits[0] == hits[1]
    assert hits[0], "expected at least one hit from planted queries"

    # and it matches the single-process (no-mesh) reference
    from genomad_tpu.ops import protein_search
    from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB

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
    single = protein_search.search(names, seqs, db)
    assert hits[0].keys() == single.keys()
    for q, (target, ev, bits, taxid) in single.items():
        gt, ge, gb, gx = hits[0][q]
        assert (gt, gb, gx) == (target, bits, taxid), q
        np.testing.assert_allclose(ge, ev, rtol=1e-4)
