"""Search-engine scale benchmark: synthetic DB + query load.

Measures the marker-search pipeline end to end (k-mer index build, C++/numpy
prefilter, device SW, best-hit selection) and prints per-stage rates.

Usage: python tools/bench_search.py [n_profiles] [n_queries]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu.ops import protein_search  # noqa: E402
from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB  # noqa: E402


def main(n_profiles: int = 20_000, n_queries: int = 500) -> None:
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    cache = Path(f"/tmp/genomad_tpu_bench_db_int_{n_profiles}.npz")
    if cache.exists():
        db = ProfileDB.load(cache)
        src = f"loaded from {cache}"
    else:
        from genomad_tpu.ops.statistics import BACKGROUND_FREQS

        # background consensus composition: representative of real profile
        # DBs (uniform would inflate similar-k-mer expansion ~25x); integer
        # scores: the shape of real profile DBs, exercising the int8 scan
        db = ProfileDB.synthetic(
            seed=1,
            n_profiles=n_profiles,
            min_len=60,
            max_len=400,
            residue_freqs=BACKGROUND_FREQS,
            integral=True,
        )
        db.save(cache)
        src = "built"
    print(f"DB: {db.n_profiles} profiles, {db.total_positions:,} positions "
          f"({src}, {time.perf_counter() - t0:.1f}s)", flush=True)

    t0 = time.perf_counter()
    db.kmer_index(1)
    print(f"k-mer index: {time.perf_counter() - t0:.1f}s", flush=True)

    # queries: 60% mutated consensus sequences, 40% random noise
    names, seqs = [], []
    for qi in range(n_queries):
        if qi % 5 < 3:
            target = int(rng.integers(0, n_profiles))
            seq = db.consensus(target).copy()
            pos = rng.choice(len(seq), len(seq) // 10, replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        else:
            seq = rng.integers(0, N_AA, int(rng.integers(60, 400)))
        names.append(f"q_{qi}")
        seqs.append("".join(ALPHABET[r] for r in seq))
    total_residues = sum(len(s) for s in seqs)

    t0 = time.perf_counter()
    hits = protein_search.search(names, seqs, db)
    elapsed = time.perf_counter() - t0
    print(
        f"search (cold: DB staging + compiles): {elapsed:.2f}s -> "
        f"{n_queries / elapsed:.1f} queries/s, {len(hits)} hits "
        f"({len(hits) / (n_queries * 0.6) * 100:.0f}% of planted queries matched)",
        flush=True,
    )
    # steady state: DB resident in HBM, programs compiled
    t0 = time.perf_counter()
    hits = protein_search.search(names, seqs, db)
    elapsed = time.perf_counter() - t0
    print(
        f"search (steady state): {elapsed:.2f}s -> {n_queries / elapsed:.1f} queries/s, "
        f"{total_residues / elapsed / 1e3:.1f} kaa/s"
    )


if __name__ == "__main__":
    n_profiles = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    main(n_profiles, n_queries)
