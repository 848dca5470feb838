"""Host-prefilter microbenchmark: q/s at a given DB scale.

Usage: python tools/bench_prefilter.py [n_profiles] [n_queries]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu import native  # noqa: E402
from genomad_tpu.ops import blosum, profiledb  # noqa: E402
from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB  # noqa: E402


def load_db(n_profiles: int) -> ProfileDB:
    cache = Path(f"/tmp/genomad_tpu_bench_db_bg_{n_profiles}.npz")
    if cache.exists():
        return ProfileDB.load(cache)
    from genomad_tpu.ops.statistics import BACKGROUND_FREQS

    db = ProfileDB.synthetic(
        seed=1, n_profiles=n_profiles, min_len=60, max_len=400,
        residue_freqs=BACKGROUND_FREQS,
    )
    db.save(cache)
    return db


def make_queries(db: ProfileDB, n_queries: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    seqs = []
    for qi in range(n_queries):
        if qi % 5 < 3:
            target = int(rng.integers(0, db.n_profiles))
            seq = db.consensus(target).copy()
            pos = rng.choice(len(seq), len(seq) // 10, replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        else:
            seq = rng.integers(0, N_AA, int(rng.integers(60, 400)))
        seqs.append("".join(ALPHABET[r] for r in seq))
    return seqs


def main(n_profiles: int = 20_000, n_queries: int = 500) -> None:
    t0 = time.perf_counter()
    db = load_db(n_profiles)
    print(f"DB: {db.n_profiles} profiles, {db.total_positions:,} positions "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    index = db.kmer_index(1)
    print(f"k-mer index: {time.perf_counter() - t0:.1f}s "
          f"({len(index.profiles):,} entries)", flush=True)
    seqs = make_queries(db, n_queries)
    residues_list = [profiledb.encode_protein(s) for s in seqs]
    total_aa = sum(len(r) for r in residues_list)
    kmer_thr = blosum.kmer_score_threshold(4.2)
    # warm the expansion product tables
    native.native_prefilter_batch(
        index, residues_list[:2], db, 25.0, kmer_thr=kmer_thr,
        max_out_per_query=db.n_profiles,
    )
    t0 = time.perf_counter()
    result = native.native_prefilter_batch(
        index, residues_list, db, 25.0, kmer_thr=kmer_thr,
        max_out_per_query=db.n_profiles,
    )
    dt = time.perf_counter() - t0
    assert result is not None
    ids_list, _, dropped = result
    counts = np.array([len(x) for x in ids_list])
    planted = sum(1 for qi in range(n_queries) if qi % 5 < 3)
    rng = np.random.default_rng(0)
    found = 0
    for qi in range(n_queries):
        if qi % 5 < 3:
            target = int(rng.integers(0, db.n_profiles))
            rng.choice(counts.max() or 1, 1)  # keep RNG stream aligned: consume
    # recall check via fresh generation (mirrors make_queries stream)
    rng = np.random.default_rng(0)
    for qi in range(n_queries):
        if qi % 5 < 3:
            target = int(rng.integers(0, db.n_profiles))
            seq = db.consensus(target).copy()
            pos = rng.choice(len(seq), len(seq) // 10, replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
            if target in ids_list[qi]:
                found += 1
        else:
            rng.integers(0, N_AA, int(rng.integers(60, 400)))
    print(
        f"prefilter: {dt:.2f}s = {n_queries / dt:.1f} q/s = "
        f"{total_aa / dt / 1e3:.1f} kaa/s; cands/query p50={np.median(counts):.0f} "
        f"mean={counts.mean():.0f} max={counts.max()}; "
        f"planted recall {found}/{planted}; dropped={dropped}",
        flush=True,
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 20_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 500,
    )
