"""Benchmark: pipeline throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

The headline metric is Mbp/s of nucleotide sequence classified by the NN
branch (6,000 bp windows -> 5,997 tokens -> IGLOO forward, bf16);
vs_baseline divides by a MEASURED number (tools/measure_baseline.py runs
the reference's own Keras classifier on this host's CPU; see BASELINE.md).

"extra" carries the rest of the pipeline, all measured here:
  * marker search steady-state at 20k- and 227k-profile (production) scale,
    in kaa/s and Mbp/s-equivalent of input DNA (1 Mbp of input -> ~0.3 M
    aa of query residues at ~90% coding density / 3 nt per residue);
  * gene calling (Mbp/s of input DNA through the prodigal-analog);
  * synthetic end-to-end (FASTA -> summary) Mbp/s with a synthetic DB.
The reference counterpart of the search (CPU MMseqs2) is NOT measurable in
this environment — no mmseqs binary, no network — so its vs_baseline is
null; see BASELINE.md.
"""

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

WINDOW_BP = 6_000
AA_PER_MBP = 300_000.0  # ~90% coding density, 3 nt per residue
REPO = Path(__file__).resolve().parent
# Median-of-N repeats: host timing on this shared 2-vCPU VM is +/-50%
# noisy run-to-run, so every steady-state number is the median of N_REPS
# back-to-back in-process repeats with the min..max spread reported
# alongside (VERDICT r4 weak #2 — single-shot numbers are not
# reproducible between the builder's runs and the driver's capture).
N_REPS = int(os.environ.get("GENOMAD_BENCH_REPS", "3"))


def _timed_reps(fn, n=None):
    """Run ``fn`` n times; return per-rep elapsed seconds."""
    out = []
    for _ in range(n or N_REPS):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return out


def _rate_stats(work, elapsed_list):
    """Median rate + spread for a fixed amount of work per rep."""
    rates = sorted(work / e for e in elapsed_list)
    return {
        "median": statistics.median(rates),
        "min": rates[0],
        "max": rates[-1],
        "n_reps": len(rates),
    }


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

    def block():
        for _ in range(n_iters):
            out = forward(tokens_dev)
        np.asarray(out)

    stats = _rate_stats(
        n_iters * batch_size * WINDOW_BP / 1e6, _timed_reps(block)
    )
    print(
        f"# nn batch={batch_size}: {stats['median']:.2f} Mbp/s median of "
        f"{stats['n_reps']} ({stats['min']:.2f}..{stats['max']:.2f})",
        file=sys.stderr,
    )
    return stats, batch_size


def _bench_db(n_profiles: int):
    from genomad_tpu.ops.profiledb import ProfileDB

    cache = Path(f"/tmp/genomad_tpu_bench_db_int_{n_profiles}.npz")
    if cache.exists():
        return ProfileDB.load(cache)
    from genomad_tpu.ops.statistics import BACKGROUND_FREQS

    # integer scores: the shape of real profile DBs (MMseqs2 profiles
    # store integer scores), which activates the int8 prefilter scan and
    # bf16 device staging — the production paths this bench must measure
    db = ProfileDB.synthetic(
        seed=1,
        n_profiles=n_profiles,
        min_len=60,
        max_len=400,
        residue_freqs=BACKGROUND_FREQS,
        integral=True,
    )
    db.save(cache)
    return db


def bench_search(n_profiles: int, n_queries: int = 500) -> dict:
    """Marker-search steady-state rate on a synthetic profile DB.

    60% of queries are mutated consensus sequences (planted true hits),
    40% random background — the realistic mixed load. Steady state = DB
    resident in HBM, expansion tables built, programs compiled.
    """
    from genomad_tpu.ops import protein_search
    from genomad_tpu.ops.profiledb import ALPHABET, N_AA

    from genomad_tpu.ops.statistics import BACKGROUND_FREQS

    rng = np.random.default_rng(0)
    db = _bench_db(n_profiles)
    names, seqs = [], []
    for qi in range(n_queries):
        if qi % 5 < 3:
            target = int(rng.integers(0, n_profiles))
            seq = db.consensus(target).copy()
            pos = rng.choice(len(seq), len(seq) // 10, replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        else:
            # background queries draw NATURAL residue frequencies, like
            # the DB consensus does: uniform residues over-represent
            # rare high-self-score residues (W 5x, C 2x), inflating
            # similar-k-mer lists and candidate volume beyond any real
            # protein workload
            seq = rng.choice(N_AA, int(rng.integers(60, 400)), p=BACKGROUND_FREQS)
        names.append(f"q_{qi}")
        seqs.append("".join(ALPHABET[r] for r in seq))
    total_residues = sum(len(s) for s in seqs)

    t0 = time.perf_counter()
    protein_search.search(names, seqs, db)  # cold: staging + compiles
    cold = time.perf_counter() - t0
    hits = {}

    def rep():
        nonlocal hits
        hits = protein_search.search(names, seqs, db)

    stats = _rate_stats(total_residues / 1e3, _timed_reps(rep))
    kaa_s = stats["median"]
    mbps_eq = kaa_s * 1e3 / AA_PER_MBP
    print(
        f"# search {n_profiles} profiles x {n_queries} queries: "
        f"{kaa_s:.1f} kaa/s median of {stats['n_reps']} "
        f"({stats['min']:.1f}..{stats['max']:.1f}) = {mbps_eq:.4f} "
        f"Mbp/s-eq, {len(hits)} hits, cold {cold:.1f}s",
        file=sys.stderr,
    )
    return {
        "metric": f"marker_search_steady_state(n_profiles={n_profiles},n_queries={n_queries})",
        "value": round(kaa_s, 2),
        "unit": "k_residues/s",
        "spread_kaa_s": [round(stats["min"], 2), round(stats["max"], 2)],
        "n_reps": stats["n_reps"],
        "cold_seconds": round(cold, 1),
        "mbps_equivalent_input": round(mbps_eq, 4),
        "vs_baseline": None,
        "note": "reference CPU MMseqs2 unmeasurable here (no mmseqs binary, no network); host prefilter runs on 2 vCPUs (production TPU hosts have 20+ per chip)",
    }


def _synthetic_genome(total_mbp: float, seed: int = 7):
    """Contigs with a gene-like structure: alternating spacers and ORFs."""
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    codons = [
        "GCT", "TGT", "GAT", "GAA", "TTT", "GGT", "CAT", "ATT", "AAA", "CTG",
        "ATG", "AAT", "CCG", "CAA", "CGT", "TCT", "ACT", "GTT", "TGG", "TAT",
    ]
    records = []
    total = 0
    target = int(total_mbp * 1e6)
    ci = 0
    while total < target:
        parts = []
        length = 0
        contig_target = min(50_000, target - total)
        while length < contig_target:
            spacer = "".join(rng.choice(bases, int(rng.integers(50, 200))))
            n_codons = int(rng.integers(100, 400))
            orf = "ATG" + "".join(
                codons[i] for i in rng.integers(0, 20, n_codons)
            ) + "TAA"
            parts.append(spacer + orf)
            length += len(spacer) + len(orf)
        seq = "".join(parts)
        records.append((f"bench_contig_{ci}", seq))
        total += len(seq)
        ci += 1
    return records, total


def bench_gene_calling(total_mbp: float = 4.0) -> dict:
    """Gene-calling throughput (Mbp/s of input DNA), with the one-time
    self-training pass and the steady-state calling pass timed
    separately (VERDICT r3 #6) alongside the combined pipeline rate."""
    from genomad_tpu.ops import gene_calling as gc

    records, total_bp = _synthetic_genome(total_mbp)
    seqs = [s for _, s in records]
    t0 = time.perf_counter()
    finder = gc.GeneFinder(seqs)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_genes = sum(len(finder.find_genes(s)) for s in seqs)
    t_call = time.perf_counter() - t0
    # the full file-level driver (FASTA -> protein FASTA, threaded),
    # median of N_REPS full runs (each includes the self-training pass —
    # that IS the pipeline when no trained tables are installed)
    with tempfile.TemporaryDirectory() as td:
        fasta = Path(td) / "input.fna"
        with open(fasta, "w") as f:
            for h, s in records:
                f.write(f">{h}\n{s}\n")
        out = Path(td) / "proteins.faa"
        stats = _rate_stats(
            total_bp / 1e6,
            _timed_reps(lambda: gc.Prodigal(fasta, out).run_parallel_prodigal()),
        )
    mbps = stats["median"]
    print(
        f"# gene calling: {total_bp / 1e6:.1f} Mbp, {mbps:.3f} Mbp/s "
        f"pipeline median of {stats['n_reps']} "
        f"({stats['min']:.3f}..{stats['max']:.3f}; {n_genes} genes; train "
        f"{total_bp / t_train / 1e6:.2f} Mbp/s, steady-state calling "
        f"{total_bp / t_call / 1e6:.2f} Mbp/s single-thread)",
        file=sys.stderr,
    )
    return {
        "metric": f"gene_calling(total_mbp={total_mbp})",
        "value": round(mbps, 3),
        "unit": "Mbp/s",
        "spread_mbps": [round(stats["min"], 3), round(stats["max"], 3)],
        "n_reps": stats["n_reps"],
        "n_genes": n_genes,
        "train_mbps": round(total_bp / t_train / 1e6, 3),
        "call_mbps_single_thread": round(total_bp / t_call / 1e6, 3),
        "vs_baseline": None,
        "note": "reference pyrodigal-gv not installed here; pipeline rate includes self-training",
    }


def bench_end_to_end(total_mbp: float = 2.0, n_profiles: int = 227_897) -> dict:
    """FASTA -> summary wall-clock on a synthetic DB (the driver's actual
    metric: Mbp/s classified per chip, BASELINE.json)."""
    from genomad_tpu.cli import run_end_to_end

    records, total_bp = _synthetic_genome(total_mbp, seed=11)
    # the DB directory persists across bench invocations (and rounds): the
    # 227k-scale npz write + k-mer index build cost minutes, and the
    # on-disk index cache next to the npz only pays off if the npz stays
    db_dir = Path(f"/tmp/genomad_bench_db_dir_{n_profiles}")
    if not (db_dir / "genomad_marker_metadata.tsv").exists():
        db = _bench_db(n_profiles)
        db_dir.mkdir(exist_ok=True)
        (db_dir / "version.txt").write_text("1.9\n")
        db.save(db_dir / "genomad_profiles.npz")
        db.save(db_dir / "genomad_mini_profiles.npz")
        from genomad_tpu.ops.profiledb import ProfileDB

        ProfileDB.synthetic(seed=99, n_profiles=16, min_len=60, max_len=90).save(
            db_dir / "genomad_integrase_profiles.npz"
        )
        header = "\t".join(
            ["marker", "c1", "class", "c3", "spm_c", "spm_p", "spm_v", "gv",
             "uscg", "ph", "vh", "conjscan", "amr", "acc", "desc", "t1", "t2"]
        )
        with open(db_dir / "nodes.dmp", "w") as f:
            for t, p, r in [(1, 1, "no rank"), (10, 1, "realm")]:
                f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
        with open(db_dir / "names.dmp", "w") as f:
            for t, n in [(1, "root"), (10, "Duplodnaviria")]:
                f.write(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n")
        with open(db_dir / "genomad_marker_metadata.tsv", "w") as f:
            f.write(header + "\n")
            for i, name in enumerate(db.names):
                spec = "VV" if i % 2 else "CC"
                spm = ("0.1", "0.2", "0.9") if i % 2 else ("0.9", "0.2", "0.1")
                f.write(
                    f"{name}\tx\t{spec}\tx\t{spm[0]}\t{spm[1]}\t{spm[2]}\t0\tNA\t0\t"
                    f"{1 if i % 2 else 0}\tNA\tNA\tPF{i:05d}\tdesc{i}\tx\tx\n"
                )
    tmp = Path(tempfile.mkdtemp(prefix="genomad_bench_e2e_"))
    try:
        fasta = tmp / "input.fna"
        with open(fasta, "w") as f:
            for h, s in records:
                f.write(f">{h}\n{s}\n")
        out_dir = tmp / "out"
        start = time.perf_counter()
        run_end_to_end(fasta, out_dir, db_dir, verbose=False)
        cold = time.perf_counter() - start
        # steady state: same pipeline with programs compiled and the DB
        # staged (the deployment regime — a service classifies many inputs
        # per process); --restart forces full recompute; median of N_REPS
        stats = _rate_stats(
            total_bp / 1e6,
            _timed_reps(
                lambda: run_end_to_end(
                    fasta, out_dir, db_dir, verbose=False, restart=True
                )
            ),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    mbps = stats["median"]
    print(
        f"# end-to-end: {total_bp / 1e6:.1f} Mbp, {mbps:.3f} Mbp/s steady "
        f"median of {stats['n_reps']} ({stats['min']:.3f}.."
        f"{stats['max']:.3f}; cold first run incl. compiles: {cold:.1f}s)",
        file=sys.stderr,
    )
    return {
        "metric": f"end_to_end(total_mbp={total_mbp},n_profiles={n_profiles})",
        "value": round(mbps, 4),
        "unit": "Mbp/s",
        "spread_mbps": [round(stats["min"], 4), round(stats["max"], 4)],
        "n_reps": stats["n_reps"],
        "cold_run_seconds": round(cold, 1),
        "vs_baseline": None,
        "note": (
            f"full pipeline FASTA->summary on a synthetic "
            f"{n_profiles}-profile (production-scale) DB with the NN "
            "branch overlapping the marker search; steady state "
            "(--restart reruns), cold first-run time reported alongside "
            "(includes one-time k-mer-index/i8-cache builds when /tmp "
            "starts empty)"
        ),
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    nn_stats, batch = bench_nn(jax, jnp)
    nn_mbps = nn_stats["median"]
    extra = {
        "baseline_nn_cpu_mbps_measured": measured_baseline_mbps(),
        "nn_spread_mbps": [round(nn_stats["min"], 3), round(nn_stats["max"], 3)],
        "nn_n_reps": nn_stats["n_reps"],
    }
    for key, fn in [
        ("search_20k", lambda: bench_search(20_000)),
        ("search_227k", lambda: bench_search(227_897)),
        ("gene_calling", bench_gene_calling),
        # 20k e2e: round-over-round continuity; 227k e2e: the
        # production-representative headline (VERDICT r3 #2) at a larger
        # input so fixed per-run overheads don't flatter the rate
        ("end_to_end_20k", lambda: bench_end_to_end(n_profiles=20_000)),
        # 227k e2e input sized at 1.5 Mbp: with the round-5 profile-as-
        # query semantics the marker search aligns the FULL mandated pair
        # set (~10k candidates/gene at 227k under the reference's -k 5
        # regime), so the search dominates e2e wall-clock; 1.5 Mbp keeps
        # the median-of-3 bench completable while the rate stays
        # search-bound (input-size-insensitive beyond overhead
        # amortization — docs/performance.md round-5 notes)
        ("end_to_end", lambda: bench_end_to_end(total_mbp=1.5)),
    ]:
        if os.environ.get("GENOMAD_BENCH_FAST") and key in (
            "search_227k", "end_to_end", "end_to_end_20k",
        ):
            continue
        try:
            extra[key] = fn()
        except Exception as exc:  # a sub-bench failure must not kill the run
            extra[key] = {"error": f"{type(exc).__name__}: {exc}"}
        # drop dead device buffers before the next sub-bench: deletions
        # are deferred through the tunnel, and the next bench's staging
        # peak must not collide with the previous bench's dying buffers
        import gc

        gc.collect()
        try:
            np.asarray(jnp.zeros(8).sum())  # sync point
        except Exception:
            pass

    baseline = measured_baseline_mbps()
    print(
        json.dumps(
            {
                "metric": f"nn_classification_throughput(batch={batch})",
                "value": round(nn_mbps, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(nn_mbps / baseline, 2) if baseline else None,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
