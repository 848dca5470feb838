"""Gene caller tests: translation tables, ORF discovery on planted genes,
RBS detection, DP selection, header format round-trip."""

import numpy as np
import pytest

from genomad_tpu.ops import gene_calling
from genomad_tpu.ops.gene_calling import GeneFinder, Prodigal, find_rbs, translate

# synonymous codons per amino acid under code 11 (for reverse translation)
_CODONS_FOR = {}
for _i in range(64):
    _aa = gene_calling._CODON_TABLE_11[_i]
    _bases = "ACGT"
    _codon = _bases[_i // 16] + _bases[(_i // 4) % 4] + _bases[_i % 4]
    _CODONS_FOR.setdefault(_aa, []).append(_codon)


def reverse_translate(protein: str, seed: int = 0) -> str:
    """Varied synonymous codons (seeded) so the antisense reading frames hit
    stop codons like natural sequence does."""
    rng = np.random.default_rng(seed)
    return "".join(
        _CODONS_FOR[aa][rng.integers(0, len(_CODONS_FOR[aa]))] for aa in protein
    )


def make_gene(protein: str, rbs: str = "AGGAGG", spacer: int = 7) -> str:
    """ATG + CDS + stop, preceded by an RBS at the given spacer distance."""
    return rbs + "C" * spacer + "ATG" + reverse_translate(protein) + "TAA"


def random_intergenic(rng, n):
    """Stop-dense DNA on BOTH strands and under ALL genetic codes: 'TTAA'
    is its own reverse complement and tiles TAA stops (a stop in codes 11,
    4, and 15) through every frame, so no spurious ORFs appear even under
    the giant-virus code heuristic."""
    del rng  # deterministic filler
    return ("TTAA" * (n // 4 + 1))[:n]


def test_translate_codes():
    assert translate("ATGAAATAA", 11) == "MK*"
    assert translate("TGG", 11) == "W"
    assert translate("TGA", 11) == "*"
    assert translate("TGA", 4) == "W"  # code 4: TGA -> Trp
    assert translate("TAG", 15) == "Q"  # code 15: TAG -> Gln
    assert translate("ATGNNN", 11) == "MX"


def test_find_rbs():
    motif, spacer, score = find_rbs("TTTTAGGAGGTTTTCCC")
    assert motif == "AGGAGG" and spacer == "5-10bp"
    motif, spacer, _ = find_rbs("TTTTTTTTTTGGAGGCCCC")
    assert motif == "GGAGG" and spacer == "3-4bp"
    motif, spacer, score = find_rbs("TTTTTTTTTTTTTTTTT")
    assert motif == "None" and score == 0.0
    # motif too close to the start (spacer < 3) does not count
    motif, _, _ = find_rbs("TTTTTTTTTTTAGGAGG")
    assert motif != "AGGAGG"


def test_gene_finder_planted_genes(rng):
    proteins = [
        "MAKLVINLDGSKQRITLTPEQAEQLAKELGVEIKTEDGKLVITGDAKDLDAIKALVEEGAKLAEELGIKLEDL",
        "MSTKEQILEAIKELSPEQLAQVLDWAEKLGIELSEEEIKEAIKAVEKSGLKVSDEELAEVAGLSREEVEALKK",
    ]
    intergenic = random_intergenic(rng, 150)
    seq = (
        random_intergenic(rng, 100)
        + make_gene(proteins[0][1:])  # ATG supplied by make_gene
        + intergenic
        + make_gene(proteins[1][1:])
        + random_intergenic(rng, 100)
    )
    finder = GeneFinder([seq], try_alt_codes=False)
    genes = finder.find_genes(seq)
    assert len(genes) >= 2
    translations = [g.translate() for g in genes]
    found = [any(p[1:] in t or t in p for t in translations) for p in proteins]
    assert all(found), f"planted proteins not recovered: {translations}"
    # planted genes carry the AGGAGG RBS
    planted = [g for g in genes if any(p[1:] in g.translate() for p in proteins)]
    assert all(g.rbs_motif == "AGGAGG" for g in planted)
    assert all(g.strand == 1 for g in planted)
    assert all(g.start_type == "ATG" for g in planted)


def test_gene_finder_reverse_strand(rng):
    from genomad_tpu.sequence import Sequence

    protein = "MAKLVINLDGSKQRITLTPEQAEQLAKELGVEIKTEDGKLVITGDAKDLDAIKALVEEGAKLAEELGIKLEDL"
    gene_fwd = make_gene(protein[1:])
    seq_fwd = random_intergenic(np.random.default_rng(5), 120) + gene_fwd + random_intergenic(np.random.default_rng(6), 120)
    seq_rc = Sequence("x", seq_fwd).rc().seq
    finder = GeneFinder([seq_rc], try_alt_codes=False)
    genes = finder.find_genes(seq_rc)
    hits = [g for g in genes if protein[1:] in g.translate()]
    assert hits and hits[0].strand == -1


def test_prodigal_driver_roundtrip(tmp_path, rng):
    protein = "MAKLVINLDGSKQRITLTPEQAEQLAKELGVEIKTEDGKLVITGDAKDLDAIKALVEEGAKLAEELGIKLEDL"
    seq = random_intergenic(rng, 90) + make_gene(protein[1:]) + random_intergenic(rng, 90)
    fasta = tmp_path / "in.fna"
    fasta.write_text(f">contig1 description\n{seq}\n")
    out = tmp_path / "proteins.faa"
    p = Prodigal(fasta, out)
    p.run_parallel_prodigal()
    parsed = list(p.proteins())
    assert parsed, "no genes written"
    contig, gene, start, end, strand, rbs, code, gc = parsed[0]
    assert contig == "contig1"
    assert 1 <= start < end <= len(seq)
    assert strand in (1, -1)
    assert code == 11
    assert 0.0 <= gc <= 1.0
    # header format is byte-compatible with the reference parser
    header = next(iter(open(out))).strip()
    assert " # " in header and "partial=" in header and "rbs_motif=" in header


def test_genetic_code_selection():
    """A sequence whose code-11 ORFs are interrupted by TGA (readthrough in
    code 4) should trigger the giant-virus code heuristic."""
    protein = "MAKLVINLDGSKQRITLTPEQAEQLAKELGVEIKW" * 4  # long, W-rich
    cds = "ATG" + reverse_translate(protein[1:]).replace("TGG", "TGA") + "TAA"
    rng = np.random.default_rng(9)
    seq = random_intergenic(rng, 90) + "AGGAGG" + "C" * 7 + cds + random_intergenic(rng, 90)
    finder = GeneFinder([seq], try_alt_codes=True)
    genes = finder.find_genes(seq)
    # with TGA stops sprinkled in, code 11 yields fragments; code 4 reads
    # through and recovers substantially longer genes
    code4_len = sum(len(g.cds) for g in genes if g.genetic_code == 4)
    assert code4_len > 300, [(g.genetic_code, len(g.cds)) for g in genes]
