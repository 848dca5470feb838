"""annotate module end-to-end on a synthetic database: gene calling ->
profile search -> genes table -> taxonomy."""

import numpy as np
import pytest

from genomad_tpu.modules import annotate
from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB
from genomad_tpu.paths import GenomadOutputs
from tests.test_gene_calling import make_gene, random_intergenic


def test_annotate_end_to_end(tmp_path, synthetic_db_dir):
    db_dir, db = synthetic_db_dir
    # Build a contig carrying a gene whose protein is profile 7's consensus
    cons = db.consensus(7)
    protein = "M" + "".join(ALPHABET[r] for r in cons)
    rng = np.random.default_rng(3)
    seq = random_intergenic(rng, 120) + make_gene(protein[1:]) + random_intergenic(rng, 120)
    input_path = tmp_path / "sample.fna"
    input_path.write_text(f">ctg1\n{seq}\n")
    out_dir = tmp_path / "out"

    annotate.main(input_path, out_dir, db_dir, verbose=False)

    outputs = GenomadOutputs("sample", out_dir)
    assert outputs.annotate_proteins_output.exists()
    assert outputs.annotate_genes_output.exists()
    genes_lines = outputs.annotate_genes_output.read_text().splitlines()
    assert genes_lines[0].startswith("gene\tstart\tend\tlength")
    assert len(genes_lines) >= 2
    rows = [l.split("\t") for l in genes_lines[1:]]
    # the planted gene must be annotated with profile 7's marker
    target_name = str(db.names[7])
    marked = [r for r in rows if r[8] == target_name]
    assert marked, f"planted marker not found in {[r[8] for r in rows]}"
    row = marked[0]
    assert len(row) == 20
    assert row[14] == "40"  # taxid propagated
    assert row[15] == "Caudoviricetes"
    assert row[13] == "1"  # virus hallmark from metadata (profile 7 is odd)
    assert row[18] == "PF00007"
    # taxonomy assignment picked up the Caudoviricetes gene
    tax_lines = outputs.annotate_taxonomy_output.read_text().splitlines()
    assert len(tax_lines) == 2
    fields = tax_lines[1].split("\t")
    assert fields[0] == "ctg1" and fields[3] == "40"
    assert fields[4].startswith("Viruses;Duplodnaviria")

    # resume: rerunning must skip and keep outputs
    before = outputs.annotate_genes_output.read_text()
    annotate.main(input_path, out_dir, db_dir, verbose=False)
    assert outputs.annotate_genes_output.read_text() == before
