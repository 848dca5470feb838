"""Measure the REFERENCE pipeline's CPU throughput on this machine.

VERDICT round 1 flagged that bench.py compared against a guessed
baseline. This tool produces a MEASURED one by executing the reference's
own code on the host CPU:

  * NN branch: the reference's Keras classifier
    (genomad/neural_network/model.py:34-45) driven exactly like
    genomad/modules/nn_classification.py:316-318 — ``model.predict`` on
    batches of 128 windows of 5,997 tokens, CPU only (the reference
    pins CPU via CUDA_VISIBLE_DEVICES=-1, nn_classification.py:8).
    Weight VALUES don't affect throughput, so random initialization is
    equivalent to the trained checkpoint for timing purposes.

  * Marker-search branch: NOT measurable here — the ``mmseqs`` binary is
    not installed and there is no network to fetch it. Recorded as null.

Writes tools/baseline_measured.json and prints the numbers. Run once per
machine; bench.py reads the JSON if present.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def measure_nn_cpu(batch_size: int = 128, n_batches: int = 8) -> dict:
    os.environ["CUDA_VISIBLE_DEVICES"] = "-1"  # reference nn_classification.py:8
    sys.path.insert(0, str(REPO / "tools"))
    import ref_harness

    ref_harness.install_stubs()
    sys.path.insert(0, ref_harness.REFERENCE_ROOT)
    import numpy as np

    np.random.seed(0)
    import keras

    keras.utils.set_random_seed(0)
    from genomad.neural_network import model as ref_model

    clf = ref_model.create_classifier()
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 257, size=(batch_size, 5997), dtype=np.int64)

    clf.predict(tokens, batch_size=batch_size, verbose=0)  # warmup/trace
    start = time.perf_counter()
    for _ in range(n_batches):
        clf.predict(tokens, batch_size=batch_size, verbose=0)
    elapsed = time.perf_counter() - start
    windows_per_s = n_batches * batch_size / elapsed
    mbps = windows_per_s * 6_000 / 1e6
    return {
        "windows_per_s": round(windows_per_s, 2),
        "mbps": round(mbps, 4),
        "batch_size": batch_size,
        "n_batches": n_batches,
        "elapsed_s": round(elapsed, 2),
    }


def cpu_info() -> dict:
    model = ""
    try:
        for line in open("/proc/cpuinfo"):
            if line.startswith("model name"):
                model = line.split(":", 1)[1].strip()
                break
    except OSError:
        pass
    return {"model": model, "count": os.cpu_count()}


def main() -> None:
    info = {
        "generated_by": "tools/measure_baseline.py",
        "cpu": cpu_info(),
        "nn_cpu_keras": measure_nn_cpu(),
        "marker_search_cpu_mmseqs": None,
        "marker_search_note": (
            "mmseqs binary not installed and no network egress in this "
            "environment; the reference's dominant-stage CPU number cannot "
            "be measured here. See BASELINE.md."
        ),
    }
    out = REPO / "tools" / "baseline_measured.json"
    out.write_text(json.dumps(info, indent=2) + "\n")
    print(json.dumps(info, indent=2))


if __name__ == "__main__":
    main()
