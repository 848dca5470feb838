"""Host-prefilter microbenchmark — no device needed, fast iteration.

Measures the C++ prefilter alone (the search bottleneck at production DB
scale) over composition-realistic queries. GENOMAD_PREFILTER_STATS=1 for
the per-stage breakdown.

Usage: python tools/bench_prefilter.py [n_profiles] [n_queries] [n_threads]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu import native  # noqa: E402
from genomad_tpu.ops.blosum import kmer_score_threshold  # noqa: E402
from genomad_tpu.ops.profiledb import N_AA, ProfileDB  # noqa: E402


def load_db(n_profiles: int) -> ProfileDB:
    from genomad_tpu.ops.statistics import BACKGROUND_FREQS

    cache = Path(f"/tmp/genomad_tpu_bench_db_int_{n_profiles}.npz")
    if cache.exists():
        return ProfileDB.load(cache)
    db = ProfileDB.synthetic(
        seed=1, n_profiles=n_profiles, min_len=60, max_len=400,
        residue_freqs=BACKGROUND_FREQS, integral=True,
    )
    db.save(cache)
    return db


def make_queries(db: ProfileDB, n_queries: int):
    rng = np.random.default_rng(0)
    out = []
    for qi in range(n_queries):
        if qi % 5 < 3:
            seq = db.consensus(int(rng.integers(0, db.n_profiles))).copy()
            pos = rng.choice(len(seq), len(seq) // 10, replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        else:
            seq = rng.integers(0, N_AA, int(rng.integers(60, 400))).astype(np.int8)
        out.append(seq.astype(np.int8))
    return out


def main(n_profiles: int = 227_897, n_queries: int = 200, n_threads: int = 2):
    t0 = time.perf_counter()
    db = load_db(n_profiles)
    print(f"DB load: {time.perf_counter()-t0:.1f}s "
          f"({db.n_profiles} profiles, {db.total_positions:,} positions)")
    t0 = time.perf_counter()
    index = db.kmer_index(1)
    print(f"index: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    _ = db.pssm_i8
    print(f"int8 copy (+hugepage advise): {time.perf_counter()-t0:.1f}s "
          f"({'active' if db.pssm_i8 is not None else 'UNAVAILABLE'})")
    queries = make_queries(db, n_queries)
    thr = kmer_score_threshold(4.2)
    # warmup (expansion tables build once)
    native.native_prefilter_batch(index, queries[:4], db, 25.0,
                                  kmer_thr=thr, n_threads=n_threads)
    t0 = time.perf_counter()
    result = native.native_prefilter_batch(
        index, queries, db, 25.0, kmer_thr=thr, n_threads=n_threads
    )
    elapsed = time.perf_counter() - t0
    assert result is not None
    n_cands = sum(len(ids) for ids in result[0])
    print(
        f"{n_queries} queries, {n_threads} threads: {elapsed:.2f}s = "
        f"{n_queries/elapsed:.1f} q/s ({elapsed/n_queries*1e3:.1f} ms/q wall), "
        f"{n_cands/n_queries:.0f} selected/q"
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
