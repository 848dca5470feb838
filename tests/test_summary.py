"""summary module tests: FDR math, flag_sequences filter battery, and the
nn-only minimum pipeline (nn-classification -> summary)."""

import numpy as np

from genomad_tpu.modules import summary
from genomad_tpu.paths import GenomadOutputs


def test_get_fdr_array():
    fdr = summary.get_fdr_array([1.0, 0.5, 0.8])
    np.testing.assert_allclose(fdr, [0.0, 0.25, (0.5 + 0.2) / 3])
    assert summary.get_fdr_array([]).size == 0


def test_flag_sequences_nn_only_filters():
    names = np.array(["a", "b", "c"])
    scores = np.array(
        [
            [0.1, 0.2, 0.7],  # virus, passes min_score 0.7
            [0.1, 0.3, 0.6],  # virus argmax but below min_score
            [0.6, 0.1, 0.3],  # chromosome argmax
        ]
    )
    lengths = {"a": 5000, "b": 5000, "c": 5000}
    sel_names, sel_scores, fdr = summary.flag_sequences(
        names, scores, lengths, 2, 0.7, None, 1, 0.0, 0, 1, 4, {}, {}, annotate_exec=False
    )
    assert sel_names.tolist() == ["a"]
    np.testing.assert_allclose(sel_scores, [0.7])


def test_flag_sequences_gene_filters_and_hallmarks():
    names = np.array(["long", "short"])
    scores = np.array([[0.0, 0.1, 0.9], [0.0, 0.1, 0.9]])
    lengths = {"long": 5000, "short": 1000}
    n_genes = {"long": 5, "short": 2}
    # (n_uscg, marker_enrichment(3,), n_hallmarks (plasmid, virus))
    filters = {"long": (0, np.array([0, 0, 2.0]), (0, 0)), "short": (0, np.array([0, 0, 2.0]), (0, 1))}
    # min_virus_hallmarks=1 for long seqs, 1 for short: long fails (0 hallmarks)
    sel, _, _ = summary.flag_sequences(
        names, scores, lengths, 2, 0.7, None, 1, 0.0, 1, 1, 4, n_genes, filters, annotate_exec=True
    )
    assert sel.tolist() == ["short"]
    # with min_hallmarks=0 for long seqs both pass
    sel, _, _ = summary.flag_sequences(
        names, scores, lengths, 2, 0.7, None, 1, 0.0, 0, 1, 4, n_genes, filters, annotate_exec=True
    )
    assert set(sel.tolist()) == {"long", "short"}


def test_flag_sequences_provirus_dedup():
    names = np.array(["contig1"])
    scores = np.array([[0.0, 0.1, 0.9]])
    pro_names = np.array(["contig1|provirus_100_200"])
    pro_scores = np.array([[0.0, 0.05, 0.95]])
    lengths = {"contig1": 5000, "contig1|provirus_100_200": 101}
    sel, _, _ = summary.flag_sequences(
        names, scores, lengths, 2, 0.7, None, 0, 0.0, 0, 0, 4, {}, {},
        annotate_exec=False, provirus_name_array=pro_names, provirus_score_array=pro_scores,
    )
    # provirus scores higher -> selected; parent contig excluded
    assert sel.tolist() == ["contig1|provirus_100_200"]


def test_flag_sequences_fdr_cut():
    names = np.array(["a", "b", "c"])
    scores = np.array([[0, 0, 0.99], [0, 0, 0.95], [0, 0, 0.71]])
    lengths = dict.fromkeys(names, 5000)
    sel, _, fdr = summary.flag_sequences(
        names, scores, lengths, 2, 0.7, 0.05, 0, 0.0, 0, 0, 4, {}, {}, annotate_exec=False
    )
    # FDR: [0.01, 0.03, 0.1167] -> third sequence cut at max_fdr=0.05
    assert sel.tolist() == ["a", "b"]
    assert (fdr <= 0.05).all()


def test_minimum_pipeline_nn_to_summary(tmp_fasta, tmp_path, rng):
    """The minimum viable slice: nn-classification -> summary on TPU-less CPU."""
    from genomad_tpu.modules import nn_classification

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    records = [(f"contig{i}", bytes(rng.choice(bases, 4000)).decode()) for i in range(4)]
    input_path = tmp_fasta(records)
    out_dir = tmp_path / "out"
    nn_classification.main(input_path, out_dir, verbose=False)
    summary.main(input_path, out_dir, verbose=False, min_score=0.0)

    outputs = GenomadOutputs("input", out_dir)
    assert outputs.summary_virus_output.exists()
    assert outputs.summary_plasmid_output.exists()
    virus_lines = outputs.summary_virus_output.read_text().splitlines()
    plasmid_lines = outputs.summary_plasmid_output.read_text().splitlines()
    assert virus_lines[0].startswith("seq_name\tlength\ttopology\tcoordinates")
    # with min_score 0 every contig lands in exactly one summary by argmax
    n_out = (len(virus_lines) - 1) + (len(plasmid_lines) - 1)
    preds = np.load(outputs.nn_classification_npz_output)["predictions"]
    expected = int(((preds.argmax(1) == 1) | (preds.argmax(1) == 2)).sum())
    assert n_out == expected
    # FASTA outputs contain the same sequences as the summaries
    from genomad_tpu import sequence

    virus_fasta = [s.accession for s in sequence.read_fasta(outputs.summary_virus_sequences_output)] if outputs.summary_virus_sequences_output.stat().st_size else []
    assert len(virus_fasta) == len(virus_lines) - 1
