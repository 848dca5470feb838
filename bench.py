"""Benchmark: IGLOO window-classification throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

The headline metric is Mbp/s of nucleotide sequence classified by the NN
branch (6,000 bp windows -> 5,997 tokens -> IGLOO forward, bf16).

vs_baseline divides by a MEASURED number: tools/measure_baseline.py runs
the reference's own Keras classifier on this host's CPU exactly as
genomad/modules/nn_classification.py does (batch 128, CPU pinned) and
records it in tools/baseline_measured.json. No guessed constants.

"extra" carries the marker-search engine's steady-state rate (the
pipeline's dominant stage in the reference). Its reference counterpart
(CPU MMseqs2) is NOT measurable in this environment — no mmseqs binary,
no network — so its vs_baseline is null; see BASELINE.md.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

WINDOW_BP = 6_000
REPO = Path(__file__).resolve().parent


def measured_baseline_mbps() -> float | None:
    path = REPO / "tools" / "baseline_measured.json"
    if not path.exists():
        return None
    try:
        return json.loads(path.read_text())["nn_cpu_keras"]["mbps"]
    except (KeyError, ValueError):
        return None


def bench_nn(jax, jnp) -> tuple[float, int]:
    from genomad_tpu.models import igloo

    params = igloo.init_params(seed=0)
    # make_forward_bases: production fast path; params travel as jit
    # arguments (device buffers), not closure constants — constant-embedding
    # 10M-element weights makes HLO lowering pathologically slow.
    forward = igloo.make_forward_bases(params, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    batch_size = 2048
    tokens = rng.integers(0, 4, (batch_size, 6000)).astype(np.int32)
    tokens_dev = jax.device_put(tokens)
    # compile + warmup (np.asarray forces completion — block_until_ready is
    # not reliable on the axon platform)
    np.asarray(forward(tokens_dev))
    n_iters = 6
    start = time.perf_counter()
    for _ in range(n_iters):
        out = forward(tokens_dev)
    np.asarray(out)
    elapsed = time.perf_counter() - start
    mbps = n_iters * batch_size * WINDOW_BP / elapsed / 1e6
    print(f"# nn batch={batch_size}: {mbps:.2f} Mbp/s ({elapsed / n_iters * 1e3:.1f} ms/batch)", file=sys.stderr)
    return mbps, batch_size


def bench_search(n_profiles: int = 20_000, n_queries: int = 500) -> dict:
    """Marker-search steady-state rate on a synthetic profile DB."""
    from genomad_tpu.ops import protein_search
    from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB

    rng = np.random.default_rng(0)
    cache = Path(f"/tmp/genomad_tpu_bench_db_bg_{n_profiles}.npz")
    if cache.exists():
        db = ProfileDB.load(cache)
    else:
        from genomad_tpu.ops.statistics import BACKGROUND_FREQS

        # background consensus composition — representative of real profile
        # DBs (see tools/bench_search.py)
        db = ProfileDB.synthetic(
            seed=1,
            n_profiles=n_profiles,
            min_len=60,
            max_len=400,
            residue_freqs=BACKGROUND_FREQS,
        )
        db.save(cache)

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

    protein_search.search(names, seqs, db)  # cold: staging + compiles
    start = time.perf_counter()
    hits = protein_search.search(names, seqs, db)
    elapsed = time.perf_counter() - start
    rate = total_residues / elapsed
    print(
        f"# search {n_profiles} profiles x {n_queries} queries: "
        f"{rate / 1e3:.1f} kaa/s steady-state, {len(hits)} hits",
        file=sys.stderr,
    )
    return {
        "metric": f"marker_search_steady_state(n_profiles={n_profiles},n_queries={n_queries})",
        "value": round(rate / 1e3, 1),
        "unit": "k_residues/s",
        "vs_baseline": None,
        "note": "reference CPU MMseqs2 unmeasurable here (no mmseqs binary, no network)",
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    nn_mbps, batch = bench_nn(jax, jnp)
    search = bench_search()

    baseline = measured_baseline_mbps()
    print(
        json.dumps(
            {
                "metric": f"nn_classification_throughput(batch={batch})",
                "value": round(nn_mbps, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(nn_mbps / baseline, 2) if baseline else None,
                "extra": {
                    "baseline_nn_cpu_mbps_measured": baseline,
                    "search": search,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
