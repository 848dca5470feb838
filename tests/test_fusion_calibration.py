"""Branch-attention + calibration math tests and the downstream modules
(aggregated-classification, score-calibration) against synthetic upstream
outputs."""

import numpy as np
import pytest

from genomad_tpu import utils
from genomad_tpu.models import fusion
from genomad_tpu.paths import GenomadData


def test_branch_attention_formula(rng):
    """Literal re-derivation of aggregated_classification.py:10-34."""
    w = rng.uniform(0, 1, 5)
    b1 = rng.dirichlet(np.ones(3), 5)
    b2 = rng.dirichlet(np.ones(3), 5)
    got = fusion.branch_attention(w, b1, b2)
    w_1 = np.array([[0.3598502, 2.912244, -1.0668367, 1.3729712, -2.1972055, 0.9363847]])
    w_2 = np.array([[1.5372132, 2.6216774, -2.8225133, 3.0680428, 2.803005, -1.1982375]])
    alpha = w.reshape(-1, 1) @ w_1 + w_2
    dense_w = np.array(
        [
            [1.6666023, -1.1003100, -2.1425622],
            [-2.2625937, 2.7540822, -1.5622343],
            [1.9745151, 1.0952991, -2.7467837],
        ]
    )
    dense_b = np.array([0.14732242, -0.6838019, 0.5594167])
    expected = utils.softmax(
        ((b1 * alpha[:, :3] + b2 * alpha[:, 3:]) / 2) @ dense_w + dense_b, temperature=2
    )
    np.testing.assert_allclose(got, expected, rtol=1e-12)
    np.testing.assert_allclose(got.sum(1), 1.0)


def test_branch_attention_marker_weight_grows_with_coverage():
    """High marker coverage -> output tracks marker branch more closely."""
    marker = np.array([[0.0, 0.0, 1.0]])
    nn = np.array([[1.0, 0.0, 0.0]])
    low = fusion.branch_attention(np.array([0.0]), marker, nn)
    high = fusion.branch_attention(np.array([1.0]), marker, nn)
    assert high[0, 2] > low[0, 2]


def test_empirical_composition():
    scores = np.array([[0.9, 0.05, 0.05]] * 3 + [[0.1, 0.1, 0.8]])
    comp = fusion.get_empirical_sample_composition(scores)
    np.testing.assert_allclose(comp, [0.75, 0, 0.25])


def test_score_batch_correction_with_bundled_weights(rng):
    weights_file = GenomadData.score_calibration_weights_file
    assert weights_file.exists()
    scores = rng.dirichlet(np.ones(3), 10)
    for classifier in ("marker", "nn", "aggregated"):
        out = fusion.score_batch_correction(scores, np.array([0.72, 0.17, 0.11]), classifier, weights_file)
        assert out.shape == (10, 3)
        np.testing.assert_allclose(out.sum(1), 1.0, rtol=1e-9)
    # unknown classifier falls back to aggregated (reference :23-24)
    out_fallback = fusion.score_batch_correction(scores, np.array([0.72, 0.17, 0.11]), "bogus", weights_file)
    out_agg = fusion.score_batch_correction(scores, np.array([0.72, 0.17, 0.11]), "aggregated", weights_file)
    np.testing.assert_array_equal(out_fallback, out_agg)


def _fake_upstream(tmp_path, tmp_fasta, rng, n=5):
    """Build an output dir with synthetic marker+nn classification outputs."""
    from genomad_tpu.paths import GenomadOutputs

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    records = [(f"c{i}", bytes(rng.choice(bases, 3000)).decode()) for i in range(n)]
    input_path = tmp_fasta(records)
    out_dir = tmp_path / "out"
    out_dir.mkdir(exist_ok=True)
    outputs = GenomadOutputs("input", out_dir)
    names = np.array([f"c{i}" for i in range(n)])

    marker_scores = rng.dirichlet(np.ones(3), n)
    nn_scores = rng.dirichlet(np.ones(3), n)
    features = rng.uniform(0, 0.2, (n, 25))

    outputs.marker_classification_dir.mkdir(exist_ok=True)
    outputs.nn_classification_dir.mkdir(exist_ok=True)
    np.savez_compressed(
        outputs.marker_classification_npz_output, contig_names=names, predictions=marker_scores
    )
    np.savez_compressed(
        outputs.features_npz_output,
        contig_names=names,
        contig_n_genes=np.full(n, 3),
        contig_n_uscg=np.zeros(n, int),
        contig_n_hallmarks=np.ones((n, 2), int),
        contig_genetic_code=np.full(n, 11),
        contig_features=features,
        contig_marker_enrichment=rng.normal(size=(n, 3)),
    )
    np.savez_compressed(
        outputs.nn_classification_npz_output, contig_names=names, predictions=nn_scores
    )
    utils.write_execution_info("marker_classification", input_path, {}, outputs.marker_classification_execution_info)
    utils.write_execution_info("nn_classification", input_path, {"single_window": False}, outputs.nn_classification_execution_info)
    return input_path, out_dir, outputs, names, marker_scores, nn_scores, features


def test_aggregated_classification_module(tmp_path, tmp_fasta, rng):
    from genomad_tpu.modules import aggregated_classification

    input_path, out_dir, outputs, names, marker_scores, nn_scores, features = _fake_upstream(
        tmp_path, tmp_fasta, rng
    )
    aggregated_classification.main(input_path, out_dir, verbose=False)
    npz = np.load(outputs.aggregated_classification_npz_output)
    expected = fusion.branch_attention(features[:, 15:18].sum(1), marker_scores, nn_scores)
    np.testing.assert_allclose(npz["predictions"], expected, rtol=1e-12)
    assert npz["contig_names"].tolist() == names.tolist()


def test_score_calibration_module(tmp_path, tmp_fasta, rng):
    from genomad_tpu.modules import score_calibration

    input_path, out_dir, outputs, names, marker_scores, nn_scores, _ = _fake_upstream(
        tmp_path, tmp_fasta, rng
    )
    score_calibration.main(input_path, out_dir, composition="metagenome", verbose=False)
    npz = np.load(outputs.calibrated_marker_classification_npz_output)
    expected = fusion.score_batch_correction(
        marker_scores, np.array([0.84, 0.05, 0.11]), "marker", GenomadData.score_calibration_weights_file
    )
    np.testing.assert_allclose(npz["predictions"], expected, rtol=1e-12)
    assert outputs.calibrated_nn_classification_npz_output.exists()
    comp = np.load(outputs.score_calibration_compositions_npz_output)
    np.testing.assert_allclose(comp["marker"], [0.84, 0.05, 0.11])

    # auto with <1000 sequences falls back to metagenome preset
    score_calibration.main(input_path, out_dir, composition="auto", verbose=False)
    npz2 = np.load(outputs.calibrated_marker_classification_npz_output)
    np.testing.assert_allclose(npz2["predictions"], expected, rtol=1e-12)

    # force-auto uses the empirical composition
    score_calibration.main(input_path, out_dir, composition="auto", force_auto=True, verbose=False)
    npz3 = np.load(outputs.calibrated_marker_classification_npz_output)
    emp = fusion.get_empirical_sample_composition(marker_scores)
    expected3 = fusion.score_batch_correction(
        marker_scores, emp, "marker", GenomadData.score_calibration_weights_file
    )
    np.testing.assert_allclose(npz3["predictions"], expected3, rtol=1e-12)
