"""Window encoding / batched inference / per-contig merge tests, plus the
nn-classification module end-to-end with synthetic weights."""

import jax
import numpy as np

from genomad_tpu.models import igloo
from genomad_tpu.ops import nn_pipeline
from genomad_tpu.parallel import mesh as meshlib


def test_encode_windows_semantics(tmp_fasta, rng):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    long_seq = bytes(rng.choice(bases, 14_000)).decode()
    n_block = "N" * 6_000  # window 1 (0-indexed) of seq2: all Ns -> dropped
    seq2 = bytes(rng.choice(bases, 6_000)).decode() + n_block + bytes(rng.choice(bases, 3_000)).decode()
    path = tmp_fasta(
        [
            ("long", long_seq),  # windows: 6000, 6000 (2000 tail dropped)
            ("gappy", seq2),  # windows: 6000, [dropped], 3000
            ("short", "ACGT" * 300),  # 1200 bp -> single forced window
        ]
    )
    bases, names, ids = nn_pipeline.encode_windows(path)
    assert names.tolist() == ["long", "gappy", "short"]
    assert ids.tolist() == [0, 0, 1, 1, 2]
    assert bases.shape == (5, nn_pipeline.WINDOW_LENGTH)
    # the short contig's window is N-padded -> trailing base code 4
    assert (bases[4, 1200:] == 4).all()
    assert (bases[4, :1200] < 4).all()


def test_encode_windows_single_window(tmp_fasta, rng):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    path = tmp_fasta([("long", bytes(rng.choice(bases, 14_000)).decode())])
    bases, names, ids = nn_pipeline.encode_windows(path, single_window=True)
    assert bases.shape[0] == 1


def test_segment_mean():
    preds = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dtype=np.float32)
    ids = np.array([0, 0, 1])
    out = nn_pipeline.segment_mean(preds, ids, 2)
    np.testing.assert_allclose(out, [[0.5, 0.5, 0], [0, 0, 1.0]])


def test_predict_windows_padding_and_sharding(rng):
    params = igloo.init_params(seed=0)
    forward = igloo.make_forward_bases(params, compute_dtype=np.float32)
    bases = rng.integers(0, 5, size=(5, nn_pipeline.WINDOW_LENGTH)).astype(np.uint8)
    # batch smaller than total and not a divisor -> padding path
    out = nn_pipeline.predict_windows(forward, bases, batch_size=4)
    assert out.shape == (5, 3)
    # sharded over the virtual CPU mesh must match unsharded
    mesh = meshlib.make_mesh()
    out_sharded = nn_pipeline.predict_windows(forward, bases, batch_size=4, mesh=mesh)
    np.testing.assert_allclose(out, out_sharded, rtol=1e-5, atol=1e-6)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = meshlib.make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["db"] == 1
    mesh2 = meshlib.make_mesh(n_data=4, n_db=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["db"] == 2


def test_nn_classification_module(tmp_fasta, tmp_path, rng):
    from genomad_tpu.modules import nn_classification

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    records = [(f"contig{i}", bytes(rng.choice(bases, 7_000)).decode()) for i in range(3)]
    input_path = tmp_fasta(records)
    out_dir = tmp_path / "out"
    nn_classification.main(input_path, out_dir, verbose=False)

    from genomad_tpu.paths import GenomadOutputs

    outputs = GenomadOutputs("input", out_dir)
    assert outputs.nn_classification_npz_output.exists()
    npz = np.load(outputs.nn_classification_npz_output)
    assert npz["contig_names"].tolist() == ["contig0", "contig1", "contig2"]
    assert npz["predictions"].shape == (3, 3)
    np.testing.assert_allclose(npz["predictions"].sum(1), 1.0, rtol=1e-4)
    lines = outputs.nn_classification_output.read_text().splitlines()
    assert lines[0] == "seq_name\tchromosome_score\tplasmid_score\tvirus_score"
    assert len(lines) == 4

    # resume: second run must skip recomputation and keep outputs identical
    before = outputs.nn_classification_npz_output.stat().st_mtime
    nn_classification.main(input_path, out_dir, verbose=False)
    npz2 = np.load(outputs.nn_classification_npz_output)
    np.testing.assert_array_equal(npz["predictions"], npz2["predictions"])
