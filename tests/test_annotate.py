"""annotate module end-to-end on a synthetic database: gene calling ->
profile search -> genes table -> taxonomy."""

import numpy as np
import pytest

from genomad_tpu.modules import annotate
from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB
from genomad_tpu.paths import GenomadOutputs
from tests.test_features_taxonomy import _METADATA_HEADER
from tests.test_gene_calling import make_gene, random_intergenic


@pytest.fixture
def synthetic_db_dir(tmp_path):
    """A complete synthetic geNomad DB directory: packed profiles, marker
    metadata, and a minimal taxdump."""
    db_dir = tmp_path / "genomad_db"
    db_dir.mkdir()
    (db_dir / "version.txt").write_text("1.9\n")
    db = ProfileDB.synthetic(seed=17, n_profiles=40, min_len=60, max_len=120)
    # attach taxids: profile 7 -> Caudoviricetes (40)
    db.taxids[:] = 0
    db.taxids[7] = 40
    db.save(db_dir / "genomad_profiles.npz")
    db.save(db_dir / "genomad_mini_profiles.npz")
    ProfileDB.synthetic(seed=99, n_profiles=4, min_len=60, max_len=90).save(
        db_dir / "genomad_integrase_profiles.npz"
    )
    with open(db_dir / "genomad_marker_metadata.tsv", "w") as f:
        f.write(_METADATA_HEADER + "\n")
        for i, name in enumerate(db.names):
            spec = "VV" if i % 2 else "CC"
            spm = ("0.1", "0.2", "0.9") if i % 2 else ("0.9", "0.2", "0.1")
            hallmark_v = 1 if i % 2 else 0
            f.write(
                f"{name}\tx\t{spec}\tx\t{spm[0]}\t{spm[1]}\t{spm[2]}\t0\tNA\t0\t"
                f"{hallmark_v}\tNA\tNA\tPF{i:05d}\tdesc{i}\tx\tx\n"
            )
    with open(db_dir / "nodes.dmp", "w") as f:
        for t, p, r in [(1, 1, "no rank"), (10, 1, "realm"), (20, 10, "kingdom"),
                        (30, 20, "phylum"), (40, 30, "class")]:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(db_dir / "names.dmp", "w") as f:
        for t, n in [(1, "root"), (10, "Duplodnaviria"), (20, "Heunggongvirae"),
                     (30, "Uroviricota"), (40, "Caudoviricetes")]:
            f.write(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n")
    return db_dir, db


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
