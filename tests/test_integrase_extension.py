"""Integrase search path: an integrase-matching gene adjacent to a virus
island extends the provirus boundary (find_proviruses.py:675-678 analog)."""

import numpy as np

from genomad_tpu.modules import annotate, find_proviruses as fp
from genomad_tpu.ops.profiledb import ALPHABET, ProfileDB
from genomad_tpu.paths import GenomadOutputs
from tests.test_gene_calling import make_gene, random_intergenic


def test_integrase_search_and_extension(tmp_path, synthetic_db_dir):
    db_dir, db = synthetic_db_dir
    integrase_db = ProfileDB.load(db_dir / "genomad_integrase_profiles.npz")
    rng = np.random.default_rng(23)

    def gene_for(pdb, p):
        return make_gene("".join(ALPHABET[r] for r in pdb.consensus(p)))

    host = [0, 2, 4, 6, 8, 10]
    virus = [1, 3, 5, 7, 9, 11, 13]
    parts = [random_intergenic(rng, 60)]
    for p in host:
        parts += [gene_for(db, p), random_intergenic(rng, 30)]
    for p in virus:
        parts += [gene_for(db, p), random_intergenic(rng, 30)]
    # integrase gene right after the virus island (no marker, no C marker
    # in between -> reciprocal-nearest extension absorbs it)
    parts += [gene_for(integrase_db, 0), random_intergenic(rng, 30)]
    for p in host:
        parts += [gene_for(db, p), random_intergenic(rng, 30)]
    seq = "".join(parts)
    input_path = tmp_path / "sample.fna"
    input_path.write_text(f">ctg1\n{seq}\n")
    out_dir = tmp_path / "out"

    annotate.main(input_path, out_dir, db_dir, verbose=False)
    fp.main(
        input_path, out_dir, db_dir, verbose=False,
        skip_trna_identification=True, marker_threshold=4.0,
        marker_threshold_integrase=4.0, marker_threshold_edge=4.0,
    )

    outputs = GenomadOutputs("sample", out_dir)
    # the integrase search produced hits
    assert outputs.find_proviruses_mmseqs2_output.stat().st_size > 0
    lines = outputs.find_proviruses_output.read_text().splitlines()
    assert len(lines) >= 2
    fields = lines[1].split("\t")
    # provirus detected and flagged with its integrase gene
    integrase_field = fields[8]
    assert integrase_field != "NA", lines[1]
