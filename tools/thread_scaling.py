"""Prefilter thread-scaling measurement (VERDICT r4 #5).

Runs the C++ batch prefilter over a production-scale synthetic DB at 1 and
2 worker threads (this host has 2 vCPUs) with the engine's per-stage
counters (GENOMAD_PREFILTER_STATS=1), interleaved A/B repeats so the
shared-VM noise cancels, and prints wall-clock + per-stage thread-summed
times. The 20-vCPU production projection must rest on this curve, not an
assumption: per-query work units (16-query groups) are independent, the
shared read-only structures are the k-mer index + int8 PSSM (no writes),
and the only cross-thread surfaces are the allocator and memory bandwidth.

Usage: python tools/thread_scaling.py [n_profiles] [n_queries] [reps]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

os.environ.setdefault("GENOMAD_PREFILTER_STATS", "1")


def main():
    n_profiles = int(sys.argv[1]) if len(sys.argv) > 1 else 227_897
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from genomad_tpu import native
    from genomad_tpu.ops import blosum
    from genomad_tpu.ops.profiledb import N_AA, ProfileDB
    from genomad_tpu.ops.statistics import BACKGROUND_FREQS

    cache = Path(f"/tmp/genomad_tpu_bench_db_int_{n_profiles}.npz")
    if cache.exists():
        db = ProfileDB.load(cache)
    else:
        db = ProfileDB.synthetic(
            seed=1, n_profiles=n_profiles, min_len=60, max_len=400,
            residue_freqs=BACKGROUND_FREQS, integral=True,
        )
        db.save(cache)
    index = db.kmer_index(1)
    db.pssm_i8  # build/load the int8 copy outside the timed region

    rng = np.random.default_rng(0)
    thr = blosum.kmer_score_threshold(4.2)
    queries = []
    for qi in range(n_queries):
        if qi % 5 < 3:
            t = int(rng.integers(0, db.n_profiles))
            seq = db.consensus(t).copy()
            pos = rng.choice(len(seq), len(seq) // 10, replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        else:
            seq = rng.choice(N_AA, int(rng.integers(60, 400)), p=BACKGROUND_FREQS)
        queries.append(seq.astype(np.int8))
    bias_list = [blosum.comp_bias(q) for q in queries]

    def run(n_threads):
        t0 = time.perf_counter()
        res = native.native_prefilter_batch(
            index, queries, db, 25.0, kmer_thr=thr,
            max_out_per_query=db.n_profiles, n_threads=n_threads,
            bias_list=bias_list,
        )
        el = time.perf_counter() - t0
        assert res is not None
        return el, res

    # warmup (expansion tables, page cache)
    run(1)
    ref = None
    times = {1: [], 2: []}
    for rep in range(reps):
        for n_threads in (1, 2):  # interleaved A/B
            el, res = run(n_threads)
            times[n_threads].append(el)
            if ref is None:
                ref = res
            else:  # determinism across thread counts, every rep
                for q in range(len(queries)):
                    assert np.array_equal(res[0][q], ref[0][q]), (n_threads, q)
    for n_threads in (1, 2):
        ts = sorted(times[n_threads])
        med = ts[len(ts) // 2]
        print(
            f"threads={n_threads}: median {med:.2f}s "
            f"({min(ts):.2f}..{max(ts):.2f}) = {n_queries / med:.1f} q/s"
        )
    s1 = sorted(times[1])[reps // 2]
    s2 = sorted(times[2])[reps // 2]
    print(f"2-thread speedup: {s1 / s2:.2f}x (ideal 2.0)")


if __name__ == "__main__":
    main()
