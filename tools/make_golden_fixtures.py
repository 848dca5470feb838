"""Generate golden fixtures by RUNNING the reference implementation.

SURVEY.md §4 prescribes golden-file tests against outputs the reference
itself produced. The reference's external binaries (mmseqs, aragorn) and
binary-dep modules (pyrodigal_gv, xgboost, pycrfsuite, taxopy) are absent
in this environment, but its pure-Python/numpy components run fine under
tools/ref_harness.py stubs. This script drives those components on seeded
random inputs and freezes (input, output) pairs into tests/golden/, which
tests/test_golden_reference.py replays against genomad_tpu WITHOUT needing
/root/reference.

Components covered (reference file:line):
  - utils math: softmax/logistic/entropy/specificity/rle  (utils.py:328-384)
  - tokenize_dna 4-mer tokenizer                          (sequence.py:170-193)
  - Sequence.has_dtr/has_itr + seq_windows                (sequence.py:45-55,150-166)
  - branch_attention fusion                               (aggregated_classification.py:10-34)
  - score_batch_correction calibration MLP                (score_calibration.py:15-43)
  - get_fdr_array                                         (summary.py:11-18)
  - tag_provirus_genes + extend_provirus_edges +
    yield_proviruses                                      (find_proviruses.py:152-377)
  - get_feature_array (25 features + enrichment)          (marker_classification.py:217-335)

Run: python tools/make_golden_fixtures.py   (regenerates tests/golden/)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import ref_harness  # noqa: E402

ref_harness.import_reference()

from genomad import sequence as ref_sequence  # noqa: E402
from genomad import utils as ref_utils  # noqa: E402
from genomad.modules import aggregated_classification as ref_agg  # noqa: E402
from genomad.modules import find_proviruses as ref_fp  # noqa: E402
from genomad.modules import marker_classification as ref_mc  # noqa: E402
from genomad.modules import score_calibration as ref_sc  # noqa: E402
from genomad.modules import summary as ref_summary  # noqa: E402

GOLDEN = Path(__file__).resolve().parents[1] / "tests" / "golden"
REF_DATA = Path("/root/reference/genomad/data")


def random_dna(rng, n, n_prob=0.0):
    alphabet = np.array(list("ACGT"))
    seq = alphabet[rng.integers(0, 4, n)]
    if n_prob:
        seq[rng.random(n) < n_prob] = "N"
    return "".join(seq)


def gen_utils_math(rng):
    x = rng.normal(0, 3, (16, 3))
    scalars = rng.normal(0, 5, 32)
    comp = rng.dirichlet(np.ones(3), 12)
    rle_in = rng.integers(0, 2, 64)
    counts, values = ref_utils.rle_encode(rle_in.tolist())
    np.savez(
        GOLDEN / "utils_math.npz",
        x=x,
        softmax_t1=ref_utils.softmax(x, 1),
        softmax_t2=ref_utils.softmax(x, 2),
        scalars=scalars,
        logistic_t1=np.array([ref_utils.logistic(v, 1) for v in scalars]),
        logistic_t02=np.array([ref_utils.logistic(v, 0.2) for v in scalars]),
        comp=comp,
        entropy=np.array([ref_utils.entropy(c) for c in comp]),
        specificity=np.array([ref_utils.specificity(c) for c in comp]),
        rle_in=rle_in,
        rle_counts=np.asarray(counts),
        rle_values=np.asarray(values),
        rle_roundtrip=np.asarray(ref_utils.rle_decode(counts, values)),
    )


def gen_tokenizer(rng):
    seqs = [
        random_dna(rng, 500),
        random_dna(rng, 997, n_prob=0.05),
        random_dna(rng, 63),
        "ACGT" * 4,
        "N" * 40,
        random_dna(rng, 2000, n_prob=0.01).lower(),  # reference upper-cases via seq_ascii
    ]
    # reference tokenize_dna consumes Sequence.seq_ascii (uppercased BYTES —
    # it compares byte values, e.g. base == 65)
    toks = [
        np.asarray(
            ref_sequence.tokenize_dna(ref_sequence.Sequence("s", s).seq_ascii, 4),
            dtype=np.int64,
        )
        for s in seqs
    ]
    np.savez(
        GOLDEN / "tokenizer.npz",
        **{f"seq_{i}": np.frombuffer(s.encode(), dtype=np.uint8) for i, s in enumerate(seqs)},
        **{f"tok_{i}": t for i, t in enumerate(toks)},
        n=np.int64(len(seqs)),
    )


def gen_sequence_ops(rng):
    cases = []
    # DTR: repeat first 30bp at the end
    core = random_dna(rng, 800)
    cases.append(core + core[:30])
    # ITR: reverse complement of first 25bp at the end
    tab = str.maketrans("ACGT", "TGCA")
    head = random_dna(rng, 25)
    cases.append(head + random_dna(rng, 700) + head.translate(tab)[::-1])
    cases.append(random_dna(rng, 600))
    cases.append(random_dna(rng, 50))
    out = []
    for s in cases:
        seq = ref_sequence.Sequence("s", s)
        windows = [w.seq for w in ref_sequence.seq_windows(seq, 200, min_length=100)]
        out.append(
            {
                "seq": s,
                "has_dtr": bool(seq.has_dtr()),
                "has_itr": bool(seq.has_itr()),
                "rc": seq.rc().seq,
                "windows_200_100": windows,
            }
        )
    (GOLDEN / "sequence_ops.json").write_text(json.dumps(out))


def gen_branch_attention(rng):
    n = 24
    marker_freq = rng.random((n, 1))
    marker_scores = rng.dirichlet(np.ones(3), n)
    nn_scores = rng.dirichlet(np.ones(3), n)
    out = ref_agg.branch_attention(marker_freq, marker_scores, nn_scores)
    np.savez(
        GOLDEN / "branch_attention.npz",
        marker_freq=marker_freq,
        marker_scores=marker_scores,
        nn_scores=nn_scores,
        out=out,
    )


def gen_score_calibration(rng):
    weights_file = REF_DATA / "score_calibration_weights.npz"
    n = 40
    scores = rng.dirichlet(np.ones(3), n)
    comps = {
        "empirical": ref_sc.get_empirical_sample_composition(scores),
        "metagenome": np.array([0.966, 0.019, 0.015]),
        "virome": np.array([0.0, 0.02, 0.98]),
    }
    data = {"scores": scores}
    for comp_name, comp in comps.items():
        data[f"comp_{comp_name}"] = comp
        for classifier in ("marker", "nn", "aggregated"):
            data[f"out_{comp_name}_{classifier}"] = ref_sc.score_batch_correction(
                scores, comp.copy(), classifier, weights_file
            )
    np.savez(GOLDEN / "score_calibration.npz", **data)


def gen_fdr(rng):
    p = np.sort(rng.random(50))[::-1]
    np.savez(GOLDEN / "fdr.npz", p=p, fdr=ref_summary.get_fdr_array(p))


def _random_genetable(rng, n_genes, seq_name="ctg"):
    gt = ref_fp.GeneTable(seq_name)
    pos = 0
    for _ in range(n_genes):
        start = pos + int(rng.integers(1, 200))
        end = start + int(rng.integers(90, 2000))
        pos = end
        gt.starts.append(start)
        gt.ends.append(end)
        has_marker = rng.random() < 0.7
        if has_marker:
            spm_c = float(rng.random() * 3)
            spm_v = float(rng.random() * 3)
        else:
            spm_c = spm_v = 0.0
        gt.spm_c.append(spm_c)
        gt.spm_v.append(spm_v)
        gt.v_vs_c_score.append(float(np.exp(spm_v) - np.exp(spm_c)))
        gt.c_markers.append(bool(has_marker and spm_c > spm_v))
        gt.v_markers.append(bool(has_marker and spm_v > spm_c))
        gt.integrases.append(bool(rng.random() < 0.08))
    # a few tRNAs between genes
    for _ in range(int(rng.integers(0, 4))):
        t0 = int(rng.integers(0, pos))
        gt.trna_starts.append(t0)
        gt.trna_ends.append(t0 + 76)
    return gt


def gen_provirus_tagging(rng):
    cases = []
    for case in range(12):
        n_genes = int(rng.integers(6, 60))
        gt = _random_genetable(rng, n_genes, seq_name=f"ctg{case}")
        scores = rng.random(n_genes)
        # bias scores so islands form
        block = rng.integers(0, 2)
        for i in range(n_genes):
            if (i // 7) % 2 == block:
                scores[i] = scores[i] * 0.4 + 0.6
            else:
                scores[i] = scores[i] * 0.4
        labels = ref_fp.tag_provirus_genes(scores.copy(), 0.4, gt)
        ext_int = ref_fp.extend_provirus_edges(list(labels), gt, "integrase", 10000)
        ext_trna = ref_fp.extend_provirus_edges(list(ext_int), gt, "trna", 5000)
        provs = list(ref_fp.yield_proviruses(gt, list(ext_trna), 12.0, 8.0, 8.0))
        cases.append(
            {
                "starts": gt.starts,
                "ends": gt.ends,
                "spm_c": gt.spm_c,
                "spm_v": gt.spm_v,
                "v_vs_c_score": gt.v_vs_c_score,
                "c_markers": gt.c_markers,
                "v_markers": gt.v_markers,
                "integrases": gt.integrases,
                "trna_starts": gt.trna_starts,
                "trna_ends": gt.trna_ends,
                "scores": scores.tolist(),
                "labels": np.asarray(labels).astype(int).tolist(),
                "labels_ext": np.asarray(ext_trna).astype(int).tolist(),
                "proviruses": [
                    {
                        "name": p.provirus_name,
                        "start": p.start,
                        "end": p.end,
                        "n_genes": p.n_genes,
                        "v_vs_c_score": p.v_vs_c_score,
                        "has_integrase": p.has_integrase,
                        "integrase_indices": p.integrase_indices,
                        "is_edge": p.is_edge,
                    }
                    for p in provs
                ],
            }
        )
    (GOLDEN / "provirus_tagging.json").write_text(json.dumps(cases))


def gen_marker_features(rng):
    """Build FASTA + genes.tsv + mini DB metadata + RBS table in the exact
    reference on-disk formats, run reference get_feature_array, freeze
    inputs AND outputs."""
    from genomad import database as ref_db

    indir = GOLDEN / "marker_features_input"
    indir.mkdir(exist_ok=True)
    db_dir = indir / "mini_db"
    db_dir.mkdir(exist_ok=True)
    (db_dir / "version.txt").write_text("1.9\n")

    # real RBS motifs from the reference data asset (a small subset)
    rbs_lines = (REF_DATA / "rbs_categories.tsv").read_text().splitlines()
    rbs_by_cat = {}
    for line in rbs_lines:
        motif, cat = line.split("\t")
        rbs_by_cat.setdefault(cat, []).append(motif)
    rbs_file = indir / "rbs_categories.tsv"
    rbs_file.write_text("\n".join(rbs_lines) + "\n")

    classes = ["CC", "CP", "CV", "PC", "PP", "PV", "VC", "VP", "VV"]
    n_markers = 30
    with open(db_dir / "genomad_marker_metadata.tsv", "w") as f:
        f.write(
            "\t".join(
                ["marker", "c1", "class", "c3", "spm_c", "spm_p", "spm_v", "gv",
                 "uscg", "ph", "vh", "conjscan", "amr", "acc", "desc", "t1", "t2"]
            )
            + "\n"
        )
        for i in range(n_markers):
            spec = classes[i % len(classes)]
            spm = rng.random(3) * 3
            gv = int(rng.random() < 0.1)
            uscg = "USCG" if rng.random() < 0.15 else "NA"
            ph = int(rng.random() < 0.1)
            vh = int(rng.random() < 0.1)
            f.write(
                f"GENOMAD.{i:06d}.XX\tx\t{spec}\tx\t{spm[0]:.4f}\t{spm[1]:.4f}\t"
                f"{spm[2]:.4f}\t{gv}\t{uscg}\t{ph}\t{vh}\tNA\tNA\tPF{i:05d}\tdesc{i}\tx\tx\n"
            )

    fasta = indir / "input.fna"
    contigs = []
    with open(fasta, "w") as f:
        for c in range(5):
            name = f"contig_{c}"
            seq = random_dna(rng, int(rng.integers(3000, 20000)))
            contigs.append((name, len(seq)))
            f.write(f">{name}\n{seq}\n")

    genes_tsv = indir / "genes.tsv"
    all_rbs = [m for ms in rbs_by_cat.values() for m in ms]
    header = [
        "gene", "start", "end", "length", "strand", "gc_content", "genetic_code",
        "rbs_motif", "marker", "evalue", "bitscore", "uscg", "plasmid_hallmark",
        "virus_hallmark", "taxid", "taxname", "annotation_conjscan",
        "annotation_amr", "annotation_accessions", "annotation_description",
    ]
    with open(genes_tsv, "w") as f:
        f.write("\t".join(header) + "\n")
        for name, length in contigs:
            pos = 1
            gene_i = 0
            while pos + 300 < length:
                gene_i += 1
                start = pos
                end = min(start + int(rng.integers(90, 1500)), length)
                pos = end + int(rng.integers(1, 150))
                glen = end - start + 1
                strand = int(rng.choice([-1, 1]))
                marker = (
                    f"GENOMAD.{int(rng.integers(0, n_markers)):06d}.XX"
                    if rng.random() < 0.7
                    else "NA"
                )
                rbs = str(rng.choice(all_rbs))
                f.write(
                    f"{name}_{gene_i}\t{start}\t{end}\t{glen}\t{strand}\t0.5\t11\t"
                    f"{rbs}\t{marker}\tNA\tNA\tNA\tNA\tNA\tNA\tNA\tNA\tNA\tNA\tNA\n"
                )

    db_obj = ref_db.Database(db_dir)
    (
        contig_names,
        n_genes,
        n_uscg,
        n_hallmarks,
        genetic_code,
        features,
        enrichment,
    ) = ref_mc.get_feature_array(fasta, genes_tsv, db_obj, rbs_file)
    np.savez(
        GOLDEN / "marker_features.npz",
        contig_names=contig_names.astype(str),
        n_genes=n_genes,
        n_uscg=n_uscg,
        n_hallmarks=n_hallmarks,
        genetic_code=genetic_code,
        features=features,
        enrichment=enrichment,
    )


def main():
    GOLDEN.mkdir(exist_ok=True)
    rng = np.random.default_rng(42)
    gen_utils_math(rng)
    gen_tokenizer(rng)
    gen_sequence_ops(rng)
    gen_branch_attention(rng)
    gen_score_calibration(rng)
    gen_fdr(rng)
    gen_provirus_tagging(rng)
    gen_marker_features(rng)
    manifest = {
        "generator": "tools/make_golden_fixtures.py",
        "reference": "geNomad v1.12.0 at /root/reference (read-only mirror)",
        "note": "fixtures produced by EXECUTING reference code under tools/ref_harness.py stubs",
        "files": sorted(p.name for p in GOLDEN.iterdir() if p.is_file()),
    }
    (GOLDEN / "MANIFEST.json").write_text(json.dumps(manifest, indent=2))
    print("golden fixtures written to", GOLDEN)


if __name__ == "__main__":
    main()
