"""find-proviruses tests: tRNA detector, island smoothing, boundary
extension, acceptance thresholds, and the module end-to-end on a synthetic
host-virus-host contig."""

import numpy as np
import pytest

from genomad_tpu.modules import find_proviruses as fp
from genomad_tpu.ops import trna
from genomad_tpu.sequence import Sequence

# ---------------------------------------------------------------------------
# tRNA detector
# ---------------------------------------------------------------------------


def make_trna():
    """Synthetic canonical tRNA (76 nt) with perfect stems."""
    acc5 = "GGGGCCC"  # 1-7
    d_arm = "AT" + "AGCT" + "GGTTA" + "AGCT"[::-1].translate(str.maketrans("ACGT", "TGCA")) + "A"  # 8-26ish filler with a stem
    # positions: keep simple — build explicit regions
    # acceptor5(7) spacer(2) dstem5(4) dloop(8) dstem3(4) spacer(1)
    dstem5 = "AGCT"
    dstem3 = Sequence("x", dstem5).rc().seq
    ac_stem5 = "CTGCA"
    ac_stem3 = Sequence("x", ac_stem5).rc().seq
    anticodon_loop = "CT" + "AGC" + "AT"  # anticodon AGC -> codon GCT -> Ala
    t_stem5 = "GGTCC"
    t_stem3 = Sequence("x", t_stem5).rc().seq
    t_loop = "TTCGAAT"
    acc3 = Sequence("x", acc5).rc().seq
    discriminator = "A"
    seq = (
        acc5 + "TA" + dstem5 + "AGTTGGGT" + dstem3 + "C"
        + ac_stem5 + anticodon_loop + ac_stem3 + "AGGTC"
        + t_stem5 + t_loop + t_stem3 + acc3 + discriminator
    )
    return seq


def test_trna_structure_offsets():
    t = make_trna()
    # T-loop TTC must sit at the detector's expected geometry
    m = t.rfind("TTC")
    assert 46 <= m and m + 19 < len(t) + 1


def test_find_trnas_forward():
    t = make_trna()
    seq = "CTAG" * 30 + t + "CTAG" * 30
    found = trna.find_trnas(seq)
    assert found, "synthetic tRNA not detected"
    start, end, aa = found[0]
    assert abs(start - 121) <= 2 and abs(end - (120 + len(t))) <= 2
    assert aa == "Ala"


def test_find_trnas_reverse_strand():
    t = make_trna()
    seq = "CTAG" * 30 + t + "CTAG" * 30
    rc = Sequence("x", seq).rc().seq
    found = trna.find_trnas(rc)
    assert found
    start, end, aa = found[0]
    assert aa == "Ala"


def test_no_trna_in_filler():
    assert trna.find_trnas("CTAG" * 100) == []


def test_aragorn_driver(tmp_path):
    t = make_trna()
    fasta = tmp_path / "in.fna"
    fasta.write_text(f">c1\n{'CTAG' * 30}{t}{'CTAG' * 30}\n")
    out = tmp_path / "trna.tsv"
    trna.Aragorn(fasta, out).run_parallel_aragorn()
    lines = out.read_text().splitlines()
    assert len(lines) == 1
    name, start, end = lines[0].split("\t")
    assert name == "c1_tRNA1_Ala"


# ---------------------------------------------------------------------------
# Island logic
# ---------------------------------------------------------------------------


def make_genetable(spm_pairs, integrases=None, trnas=None):
    gt = fp.GeneTable("ctg")
    for i, (spm_c, spm_v) in enumerate(spm_pairs):
        start = i * 1000 + 1
        gt.starts.append(start)
        gt.ends.append(start + 899)
        gt.spm_c.append(spm_c)
        gt.spm_v.append(spm_v)
        gt.v_vs_c_score.append(float(np.exp(spm_v) - np.exp(spm_c)))
        gt.c_markers.append(spm_c > spm_v)
        gt.v_markers.append(spm_v > spm_c)
        gt.integrases.append(bool(integrases and i in integrases))
    if trnas:
        for s, e in trnas:
            gt.trna_starts.append(s)
            gt.trna_ends.append(e)
    return gt


def test_tag_provirus_genes_absorbs_small_phage_island():
    # 3 phage-scored genes in the middle of a host contig: below
    # min_genes_phage_island=5 -> absorbed back to host
    spm = [(0.9, 0.0)] * 6 + [(0.0, 0.9)] * 3 + [(0.9, 0.0)] * 6
    gt = make_genetable(spm)
    scores = np.array([0.0] * 6 + [0.9] * 3 + [0.0] * 6)
    labels = fp.tag_provirus_genes(scores, 0.4, gt)
    assert labels == [0] * 15


def test_tag_provirus_genes_keeps_large_phage_island():
    spm = [(0.9, 0.0)] * 6 + [(0.0, 0.9)] * 6 + [(0.9, 0.0)] * 6
    gt = make_genetable(spm)
    scores = np.array([0.0] * 6 + [0.9] * 6 + [0.0] * 6)
    labels = fp.tag_provirus_genes(scores, 0.4, gt)
    assert labels == [0] * 6 + [1] * 6 + [0] * 6


def test_tag_provirus_genes_absorbs_small_host_island():
    # small host gap (3 genes, 1 C marker) inside a phage region -> phage
    spm = (
        [(0.9, 0.0)] * 6
        + [(0.0, 0.9)] * 5
        + [(0.9, 0.0)] * 1 + [(0.0, 0.0)] * 2
        + [(0.0, 0.9)] * 5
        + [(0.9, 0.0)] * 6
    )
    gt = make_genetable(spm)
    scores = np.array([0.0] * 6 + [0.9] * 5 + [0.0] * 3 + [0.9] * 5 + [0.0] * 6)
    labels = fp.tag_provirus_genes(scores, 0.4, gt)
    assert labels == [0] * 6 + [1] * 13 + [0] * 6


def test_extend_provirus_edges_integrase():
    # phage island genes 6-11; integrase at gene 13 (within 10 kb)
    spm = [(0.9, 0.0)] * 6 + [(0.0, 0.9)] * 6 + [(0.0, 0.0)] * 2 + [(0.9, 0.0)] * 4
    gt = make_genetable(spm, integrases={13})
    labels = [0] * 6 + [1] * 6 + [0] * 2 + [0] * 4
    extended = fp.extend_provirus_edges(labels, gt, "integrase", 10_000)
    assert extended[13] == 1  # integrase gene absorbed
    assert extended[:6] == [0] * 6


def test_extend_provirus_edges_blocked_by_chromosome_marker():
    # same, but a chromosome marker sits between the island and integrase
    spm = [(0.9, 0.0)] * 6 + [(0.0, 0.9)] * 6 + [(0.9, 0.0)] * 1 + [(0.0, 0.0)] * 1 + [(0.9, 0.0)] * 4
    gt = make_genetable(spm, integrases={13})
    labels = [0] * 6 + [1] * 6 + [0] * 8
    extended = fp.extend_provirus_edges(labels, gt, "integrase", 10_000)
    assert extended == labels


def test_yield_proviruses_thresholds():
    # island of 6 virus genes: v_vs_c = 6 * (e^0.9 - 1) = 8.76 -> below the
    # plain threshold 12, above edge/integrase threshold 8
    spm = [(0.0, 0.0)] * 3 + [(0.0, 0.9)] * 6 + [(0.0, 0.0)] * 3
    gt = make_genetable(spm)
    labels = [0] * 3 + [1] * 6 + [0] * 3
    got = list(fp.yield_proviruses(gt, labels, 12.0, 8.0, 8.0))
    assert got == []  # mid-island, no integrase, below 12
    # same island at the contig edge passes the edge threshold
    labels_edge = [1] * 6 + [0] * 6
    gt2 = make_genetable([(0.0, 0.9)] * 6 + [(0.0, 0.0)] * 6)
    got = list(fp.yield_proviruses(gt2, labels_edge, 12.0, 8.0, 8.0))
    assert len(got) == 1
    assert got[0].is_edge and got[0].start == 1 and got[0].end == 5900
    assert got[0].provirus_name == "ctg|provirus_1_5900"


# ---------------------------------------------------------------------------
# Module end-to-end
# ---------------------------------------------------------------------------


def test_find_proviruses_end_to_end(tmp_path, synthetic_db_dir):
    from genomad_tpu.modules import annotate
    from genomad_tpu.ops.profiledb import ALPHABET
    from genomad_tpu.paths import GenomadOutputs
    from tests.test_gene_calling import make_gene, random_intergenic

    db_dir, db = synthetic_db_dir
    rng = np.random.default_rng(7)

    def gene_for_profile(p):
        protein = "".join(ALPHABET[r] for r in db.consensus(p))
        return make_gene(protein)

    # profiles: even = CC (host), odd = VV (virus) per the fixture metadata
    host_profiles = [0, 2, 4, 6, 8, 10, 12]
    virus_profiles = [1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23]
    parts = [random_intergenic(rng, 60)]
    for p in host_profiles:
        parts += [gene_for_profile(p), random_intergenic(rng, 30)]
    for p in virus_profiles:
        parts += [gene_for_profile(p), random_intergenic(rng, 30)]
    for p in host_profiles:
        parts += [gene_for_profile(p), random_intergenic(rng, 30)]
    seq = "".join(parts)
    input_path = tmp_path / "sample.fna"
    input_path.write_text(f">ctg1\n{seq}\n")
    out_dir = tmp_path / "out"

    annotate.main(input_path, out_dir, db_dir, verbose=False)
    # the gene caller recovers ~7 of the planted virus markers (~1.35 score
    # each); lower the acceptance threshold accordingly (CLI-exposed knob)
    fp.main(
        input_path, out_dir, db_dir, verbose=False,
        skip_trna_identification=True, marker_threshold=6.0,
    )

    outputs = GenomadOutputs("sample", out_dir)
    lines = outputs.find_proviruses_output.read_text().splitlines()
    assert len(lines) >= 2, "no provirus detected"
    fields = lines[1].split("\t")
    name, source, start, end = fields[0], fields[1], int(fields[2]), int(fields[3])
    assert source == "ctg1"
    assert name == f"ctg1|provirus_{start}_{end}"
    # the provirus region must cover the virus block, not the host blocks
    host_block_len = sum(len(gene_for_profile(p)) + 30 for p in host_profiles)
    assert start > 60  # after the first host block start
    assert start > host_block_len * 0.5
    assert end < len(seq) - host_block_len * 0.5
    # excised FASTA matches coordinates
    excised = list(__import__("genomad_tpu.sequence", fromlist=["read_fasta"]).read_fasta(
        outputs.find_proviruses_nucleotide_output
    ))
    assert len(excised) == 1
    assert excised[0].seq == seq[start - 1 : end]
    assert len(excised[0]) == end - start + 1
    # provirus genes table: renamed genes, 20-column data rows
    gene_lines = outputs.find_proviruses_genes_output.read_text().splitlines()
    assert len(gene_lines) >= 2
    assert gene_lines[1].split("\t")[0].startswith(f"ctg1|provirus_{start}_{end}_")
    assert len(gene_lines[1].split("\t")) == 20
    # provirus proteins are renamed consistently
    protein_lines = outputs.find_proviruses_proteins_output.read_text()
    assert f"ctg1|provirus_{start}_{end}_" in protein_lines
