"""Measure similar-k-mer list sizes across the sensitivity range.

The prefilter's ``-s`` knob maps linearly to a BLOSUM62 score threshold
(genomad_tpu.ops.blosum.kmer_score_threshold); this script documents the
mapping empirically: for background-frequency-distributed k-mers it prints
the per-position list-size distribution and enumeration cost at each
sensitivity, which is what the docstring numbers in ops/blosum.py are
calibrated against.

Usage: python tools/calibrate_sensitivity.py [n_samples]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu.ops.blosum import kmer_score_threshold, similar_kmers  # noqa: E402

# approximate background amino-acid frequencies (UniProt-scale averages)
BACKGROUND = np.array(
    [0.074, 0.025, 0.054, 0.054, 0.047, 0.074, 0.026, 0.068, 0.058, 0.099,
     0.025, 0.045, 0.039, 0.034, 0.052, 0.057, 0.051, 0.073, 0.013, 0.032]
)


def main(n_samples: int = 200) -> None:
    freq = BACKGROUND / BACKGROUND.sum()
    rng = np.random.default_rng(0)
    kmers = [rng.choice(20, 5, p=freq) for _ in range(n_samples)]
    print(f"{'s':>5} {'thr':>6} {'mean':>9} {'median':>8} {'p95':>8} {'max':>8} {'ms/kmer':>8}")
    for s in (1.0, 2.0, 3.0, 4.2, 5.7, 7.0, 8.2):
        thr = kmer_score_threshold(s)
        sizes = []
        t0 = time.perf_counter()
        for km in kmers:
            sizes.append(len(similar_kmers(km, thr)[0]))
        dt = (time.perf_counter() - t0) / n_samples * 1e3
        sizes = np.array(sizes)
        print(
            f"{s:5.1f} {thr:6.1f} {sizes.mean():9.1f} {np.median(sizes):8.0f} "
            f"{np.percentile(sizes, 95):8.0f} {sizes.max():8d} {dt:8.2f}"
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
