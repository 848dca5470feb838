"""Stage-level profile of the marker search: prefilter vs SW dispatch vs
merge, with pair/candidate counts. Prints a timestamped breakdown.

Usage: python tools/profile_search.py [n_profiles] [n_queries]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu.ops import protein_search  # noqa: E402
from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB  # noqa: E402


def log(msg):
    print(f"[{time.perf_counter() - T0:8.2f}s] {msg}", flush=True)


T0 = time.perf_counter()


def main(n_profiles: int = 20_000, n_queries: int = 500) -> None:
    rng = np.random.default_rng(0)
    cache = Path(f"/tmp/genomad_tpu_bench_db_bg_{n_profiles}.npz")
    if cache.exists():
        db = ProfileDB.load(cache)
    else:
        from genomad_tpu.ops.statistics import BACKGROUND_FREQS

        db = ProfileDB.synthetic(
            seed=1, n_profiles=n_profiles, min_len=60, max_len=400,
            residue_freqs=BACKGROUND_FREQS,
        )
        db.save(cache)
    log(f"DB ready: {db.n_profiles} profiles, {db.total_positions:,} positions")

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

    from genomad_tpu import native
    from genomad_tpu.ops import blosum, profiledb

    residues_list = [profiledb.encode_protein(s) for s in seqs]
    kmer_thr = blosum.kmer_score_threshold(4.2)
    t = time.perf_counter()
    index = db.kmer_index(1)
    log(f"k-mer index: {time.perf_counter() - t:.2f}s")

    t = time.perf_counter()
    result = native.native_prefilter_batch(
        index, residues_list, db, 25.0, kmer_thr=kmer_thr,
        max_out_per_query=db.n_profiles,
    )
    dt = time.perf_counter() - t
    assert result is not None, "native prefilter unavailable"
    ids_list, scores_list, n_dropped = result
    counts = np.array([len(x) for x in ids_list])
    log(
        f"native prefilter: {dt:.2f}s = {n_queries / dt:.1f} q/s; "
        f"candidates/query p50={np.median(counts):.0f} mean={counts.mean():.0f} "
        f"max={counts.max()} total={counts.sum():,} dropped={n_dropped}"
    )

    # stage 2 with instrumented pair-stat calls
    orig = protein_search._pair_fwd_host
    stat = {"pairs": 0, "calls": 0, "t": 0.0}

    def wrapped(pairs_q, pairs_p, **kw):
        t = time.perf_counter()
        out = orig(pairs_q, pairs_p, **kw)
        stat["t"] += time.perf_counter() - t
        stat["pairs"] += len(pairs_q)
        stat["calls"] += 1
        return out

    protein_search._pair_fwd_host = wrapped
    try:
        t = time.perf_counter()
        hits = protein_search.search(names, seqs, db)
        total = time.perf_counter() - t
    finally:
        protein_search._pair_fwd_host = orig
    log(
        f"search cold total: {total:.2f}s, {len(hits)} hits; "
        f"stage2: {stat['pairs']:,} pairs in {stat['calls']} rounds, "
        f"{stat['t']:.2f}s dispatch+sync ({stat['pairs'] / max(stat['t'], 1e-9):,.0f} pairs/s)"
    )

    stat.update(pairs=0, calls=0, t=0.0)
    protein_search._pair_fwd_host = wrapped
    try:
        t = time.perf_counter()
        hits = protein_search.search(names, seqs, db)
        total = time.perf_counter() - t
    finally:
        protein_search._pair_fwd_host = orig
    tot_res = sum(len(s) for s in seqs)
    log(
        f"search steady total: {total:.2f}s -> {n_queries / total:.1f} q/s, "
        f"{tot_res / total / 1e3:.1f} kaa/s; stage2 {stat['pairs']:,} pairs, "
        f"{stat['t']:.2f}s ({stat['pairs'] / max(stat['t'], 1e-9):,.0f} pairs/s)"
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 20_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 500,
    )
