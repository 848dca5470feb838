"""Math-primitive and resume-protocol tests (reference: genomad/utils.py)."""

import numpy as np
import pytest

from genomad_tpu import utils
from genomad_tpu.paths import GenomadOutputs


def test_softmax_temperature():
    x = np.array([[1.0, 2.0, 3.0]])
    out = utils.softmax(x, temperature=2)
    # softmax(x/2): manual computation
    e = np.exp(np.array([0.5, 1.0, 1.5]) - 1.5)
    np.testing.assert_allclose(out[0], e / e.sum(), rtol=1e-12)
    np.testing.assert_allclose(out.sum(axis=1), 1.0)


def test_logistic():
    assert utils.logistic(0.0) == 0.5
    np.testing.assert_allclose(utils.logistic(2.0, temperature=2), 1 / (1 + np.exp(-1)))
    # Large inputs must not produce NaN (reference relies on overflow -> 1.0)
    assert utils.logistic(1e6) == 1.0


def test_entropy_specificity():
    assert utils.entropy([0, 0, 0]) == np.log2(3)
    np.testing.assert_allclose(utils.entropy([1, 1]), 1.0)
    assert utils.specificity([0, 0, 0]) == 0.0
    assert utils.specificity([5]) == 0.0
    np.testing.assert_allclose(utils.specificity([1, 0, 0]), 1.0)
    np.testing.assert_allclose(utils.specificity([1, 1, 1]), 0.0, atol=1e-12)


def test_rle_roundtrip():
    arr = [1, 1, 0, 0, 0, 1, 2, 2]
    counts, values = utils.rle_encode(arr)
    assert counts == [2, 3, 1, 2]
    assert values == [1, 0, 1, 2]
    assert utils.rle_decode(counts, values) == arr
    assert utils.rle_encode([]) == ([], [])


def test_execution_info_roundtrip(tmp_path):
    input_file = tmp_path / "in.fna"
    input_file.write_text(">a\nACGT\n")
    info_file = tmp_path / "info.json"
    utils.write_execution_info("annotate", input_file, {"k": 1}, info_file)
    md5, module, params = utils.get_execution_info(info_file)
    assert module == "annotate" and params == {"k": 1}
    assert utils.compare_executions(input_file, {"k": 1}, info_file)
    assert not utils.compare_executions(input_file, {"k": 2}, info_file)
    assert utils.compare_executions(input_file, {"k": 2}, info_file, only_md5=True)
    input_file.write_text(">a\nACGA\n")
    assert not utils.compare_executions(input_file, {"k": 1}, info_file)


def test_output_prefix(tmp_path):
    f = tmp_path / "sample.fna"
    f.write_text(">a\nACGT\n")
    assert utils.output_prefix(f) == "sample"
    import gzip

    g = tmp_path / "sample2.fna.gz"
    with gzip.open(g, "wt") as fout:
        fout.write(">a\nACGT\n")
    assert utils.output_prefix(g) == "sample2"


def test_paths_registry(tmp_path):
    o = GenomadOutputs("pfx", tmp_path)
    assert o.annotate_dir == tmp_path / "pfx_annotate"
    assert o.annotate_genes_output == tmp_path / "pfx_annotate" / "pfx_genes.tsv"
    assert o.nn_classification_npz_output.name == "pfx_nn_classification.npz"
    assert o.seq_window_id_output.parent.name == "pfx_encoded_sequences"
    assert o.summary_virus_output.name == "pfx_virus_summary.tsv"
    assert (
        o.provirus_calibrated_aggregated_classification_npz_output.name
        == "pfx_provirus_calibrated_aggregated_classification.npz"
    )
    with pytest.raises(AttributeError):
        o.nonexistent_output


def test_natsort():
    assert utils.natsort(["f10.tfrec", "f2.tfrec", "f1.tfrec"]) == [
        "f1.tfrec",
        "f2.tfrec",
        "f10.tfrec",
    ]
