"""Full-pipeline test on the synthetic database: annotate ->
find-proviruses -> marker-classification -> nn-classification ->
aggregated-classification -> score-calibration -> summary, plus CLI smoke
tests."""

import numpy as np
from click.testing import CliRunner

from genomad_tpu import cli
from genomad_tpu.paths import GenomadOutputs


def test_run_end_to_end(tmp_path, synthetic_db_dir):
    from genomad_tpu.ops.profiledb import ALPHABET
    from tests.test_gene_calling import make_gene, random_intergenic

    db_dir, db = synthetic_db_dir
    rng = np.random.default_rng(11)

    def gene_for_profile(p):
        return make_gene("".join(ALPHABET[r] for r in db.consensus(p)))

    # contig 1: host-ish (CC markers); contig 2: virus-ish (VV markers);
    # both long enough for one NN window
    c1 = random_intergenic(rng, 60)
    for p in (0, 2, 4, 6, 8, 10):
        c1 += gene_for_profile(p) + random_intergenic(rng, 30)
    c1 += random_intergenic(rng, 800)
    c2 = random_intergenic(rng, 60)
    for p in (1, 3, 5, 7, 9, 11):
        c2 += gene_for_profile(p) + random_intergenic(rng, 30)
    c2 += random_intergenic(rng, 800)
    input_path = tmp_path / "sample.fna"
    input_path.write_text(f">host1\n{c1}\n>virus1\n{c2}\n")
    out_dir = tmp_path / "out"

    cli.run_end_to_end(
        input_path, out_dir, db_dir, verbose=False,
        skip_trna_identification=True, enable_score_calibration=True,
        min_score=0.0, max_fdr=1.0, min_number_genes=0,
        min_plasmid_marker_enrichment=-100, min_virus_marker_enrichment=-100,
        min_plasmid_hallmarks=0, min_plasmid_hallmarks_short_seqs=0,
        min_virus_hallmarks=0, min_virus_hallmarks_short_seqs=0, max_uscg=100,
    )

    outputs = GenomadOutputs("sample", out_dir)
    # every stage produced its outputs
    for p in (
        outputs.annotate_genes_output,
        outputs.find_proviruses_output,
        outputs.features_npz_output,
        outputs.marker_classification_npz_output,
        outputs.nn_classification_npz_output,
        outputs.aggregated_classification_npz_output,
        outputs.calibrated_aggregated_classification_npz_output,
        outputs.summary_virus_output,
        outputs.summary_plasmid_output,
    ):
        assert p.exists(), p

    # aggregated scores = branch attention of marker + nn scores
    from genomad_tpu.models import fusion

    feats = np.load(outputs.features_npz_output)
    marker = np.load(outputs.marker_classification_npz_output)
    nn = np.load(outputs.nn_classification_npz_output)
    agg = np.load(outputs.aggregated_classification_npz_output)
    expected = fusion.branch_attention(
        feats["contig_features"][:, 15:18].sum(1), marker["predictions"], nn["predictions"]
    )
    np.testing.assert_allclose(agg["predictions"], expected, rtol=1e-6)

    # summary used calibrated aggregated scores (priority ladder top)
    virus_rows = outputs.summary_virus_output.read_text().splitlines()[1:]
    plasmid_rows = outputs.summary_plasmid_output.read_text().splitlines()[1:]
    calib = np.load(outputs.calibrated_aggregated_classification_npz_output)
    names = calib["contig_names"].tolist()
    preds = calib["predictions"]
    expected_virus = {names[i] for i in range(len(names)) if preds[i].argmax() == 2}
    got_virus = {r.split("\t")[0] for r in virus_rows}
    assert got_virus == expected_virus


def test_end_to_end_restart_deterministic(tmp_path, synthetic_db_dir):
    """--restart recomputes to identical scores, and a plain re-run resumes
    from the execution-info cache — with the NN branch now OVERLAPPING
    annotate (cli.run_end_to_end), both properties must survive the
    two-call nn-classification structure (contig pass during overlap,
    provirus pass after find-proviruses)."""
    from genomad_tpu.ops.profiledb import ALPHABET
    from tests.test_gene_calling import make_gene, random_intergenic

    db_dir, db = synthetic_db_dir
    rng = np.random.default_rng(23)
    contig = random_intergenic(rng, 60)
    for p in (1, 3, 5):
        contig += make_gene(
            "".join(ALPHABET[r] for r in db.consensus(p))
        ) + random_intergenic(rng, 30)
    contig += random_intergenic(rng, 800)
    input_path = tmp_path / "sample.fna"
    input_path.write_text(f">c1\n{contig}\n")
    out_dir = tmp_path / "out"
    kwargs = dict(
        verbose=False, skip_trna_identification=True,
        min_score=0.0, max_fdr=1.0, min_number_genes=0,
        min_plasmid_marker_enrichment=-100, min_virus_marker_enrichment=-100,
        min_plasmid_hallmarks=0, min_plasmid_hallmarks_short_seqs=0,
        min_virus_hallmarks=0, min_virus_hallmarks_short_seqs=0, max_uscg=100,
    )

    outputs = GenomadOutputs("sample", out_dir)
    cli.run_end_to_end(input_path, out_dir, db_dir, **kwargs)
    agg1 = np.load(outputs.aggregated_classification_npz_output)["predictions"]

    cli.run_end_to_end(input_path, out_dir, db_dir, restart=True, **kwargs)
    agg2 = np.load(outputs.aggregated_classification_npz_output)["predictions"]
    np.testing.assert_array_equal(agg1, agg2)

    # resume: the nn execution info must mark the run complete so the
    # second nn call (and a later resume) skip the contig pass
    mtime = outputs.nn_classification_npz_output.stat().st_mtime_ns
    cli.run_end_to_end(input_path, out_dir, db_dir, **kwargs)
    assert outputs.nn_classification_npz_output.stat().st_mtime_ns == mtime
    agg3 = np.load(outputs.aggregated_classification_npz_output)["predictions"]
    np.testing.assert_array_equal(agg1, agg3)


def test_cli_help_lists_commands():
    runner = CliRunner()
    result = runner.invoke(cli.cli, ["--help"])
    assert result.exit_code == 0
    for cmd in (
        "download-database", "annotate", "find-proviruses",
        "marker-classification", "nn-classification",
        "aggregated-classification", "score-calibration", "summary",
        "end-to-end",
    ):
        assert cmd in result.output


def test_cli_preset_conflicts_with_filters(tmp_path):
    (tmp_path / "in.fna").write_text(">a\nACGT\n")
    runner = CliRunner()
    result = runner.invoke(
        cli.cli,
        ["summary", str(tmp_path / "in.fna"), str(tmp_path / "out"),
         "--conservative", "--min-score", "0.9"],
    )
    assert result.exit_code != 0
    assert "cannot use filtering options" in result.output


def test_cli_nn_classification_command(tmp_path, tmp_fasta, rng):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    input_path = tmp_fasta([("c1", bytes(rng.choice(bases, 3000)).decode())])
    runner = CliRunner()
    result = runner.invoke(
        cli.cli,
        ["nn-classification", str(input_path), str(tmp_path / "out"), "--quiet"],
    )
    assert result.exit_code == 0, result.output
    outputs = GenomadOutputs("input", tmp_path / "out")
    assert outputs.nn_classification_output.exists()
