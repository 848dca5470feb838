"""Live parity vs the reference Keras model (the real deal, not a fixture).

The environment ships TensorFlow + Keras 3, so we can EXECUTE the
reference's own model builder (genomad/neural_network/model.py:34-45) to
produce a genuine ``nn_classifier.h5``-style checkpoint, then verify that

  1. ``weights.load_keras_h5`` correctly routes every tensor for all three
     HDF5 layouts Keras can produce for this artifact (legacy whole-model
     .h5, legacy weights-only .h5 with ":0" names, Keras 3 .weights.h5), and
  2. our JAX IGLOO forward (genomad_tpu/models/igloo.py) matches the Keras
     forward on the same inputs to float32 tolerance.

This closes the "converter is an unvalidated guess" gap: the only thing a
real trained nn_classifier.h5 changes versus these checkpoints is the
weight VALUES, which these tests cover with random draws.

Skipped automatically when TF or the reference tree is unavailable.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")
TOOLS = Path(__file__).resolve().parent.parent / "tools"

tf = pytest.importorskip("tensorflow")
pytestmark = pytest.mark.skipif(
    not (REFERENCE_ROOT / "genomad" / "neural_network" / "model.py").exists(),
    reason="reference tree not mounted",
)


@pytest.fixture(scope="module")
def keras_artifacts(tmp_path_factory):
    """Build the reference classifier once; save every checkpoint layout."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    sys.path.insert(0, str(TOOLS))
    import ref_harness

    ref_harness.install_stubs()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import keras

    np.random.seed(1234)  # reference gen_filters_igloo uses np.random directly
    keras.utils.set_random_seed(1234)
    from genomad.neural_network import model as ref_model

    clf = ref_model.create_classifier()

    out = tmp_path_factory.mktemp("keras_ckpt")
    legacy = out / "nn_classifier.h5"
    modern = out / "nn_classifier.weights.h5"
    clf.save(legacy)  # legacy whole-model HDF5 (/model_weights/<layer>/...)
    clf.save_weights(modern)  # Keras 3 layout (/layers/<layer>/vars/<i>)

    # Legacy weights-ONLY layout (what Keras 2 save_weights wrote): layer
    # groups at top level, dataset names suffixed ":0". Synthesized by
    # restructuring the whole-model file so the converter sees that shape
    # of tree too.
    import h5py

    legacy_w = out / "nn_classifier.weights_only_legacy.h5"
    with h5py.File(legacy, "r") as src, h5py.File(legacy_w, "w") as dst:

        def copy(group, dgroup):
            for key, item in group.items():
                if isinstance(item, h5py.Dataset):
                    dgroup.create_dataset(f"{key}:0", data=np.asarray(item))
                else:
                    copy(item, dgroup.create_group(key))

        copy(src["model_weights"], dst)

    # Reference forward on random windows (token values span the full
    # vocabulary: 0 = N-containing window, 1..256 = 4-mers).
    rng = np.random.default_rng(99)
    tokens = rng.integers(0, 257, size=(8, 5997), dtype=np.int64)
    ref_probs = clf.predict(tokens, batch_size=8, verbose=0)
    return {
        "legacy": legacy,
        "modern": modern,
        "legacy_weights_only": legacy_w,
        "tokens": tokens,
        "ref_probs": ref_probs,
    }


@pytest.mark.parametrize("layout", ["legacy", "modern", "legacy_weights_only"])
def test_converter_routes_all_layouts(keras_artifacts, layout):
    from genomad_tpu.models import weights

    params = weights.load_keras_h5(keras_artifacts[layout])
    ref = weights.load_keras_h5(keras_artifacts["legacy"])
    # Every layout must produce the identical pytree.
    for group in ref:
        for name in ref[group]:
            np.testing.assert_array_equal(
                np.asarray(params[group][name]),
                np.asarray(ref[group][name]),
                err_msg=f"{layout}: {group}/{name} routed differently",
            )


def test_jax_forward_matches_keras(keras_artifacts):
    import jax.numpy as jnp

    from genomad_tpu.models import igloo, weights

    params = weights.load_keras_h5(keras_artifacts["legacy"])
    prepared = igloo.prepare_params(params, compute_dtype=jnp.float32)
    tokens = jnp.asarray(keras_artifacts["tokens"], jnp.int32)
    got = np.asarray(igloo.apply(prepared, tokens))
    want = keras_artifacts["ref_probs"]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_jax_bases_path_matches_keras(keras_artifacts):
    """The production bases->probs fast path must agree with Keras on real
    DNA: bases -> (host tokenizer == device tokenizer) -> same probs."""
    import jax.numpy as jnp

    from genomad_tpu import sequence
    from genomad_tpu.models import igloo, weights

    params = weights.load_keras_h5(keras_artifacts["legacy"])
    prepared = igloo.prepare_params(params, compute_dtype=jnp.float32)

    rng = np.random.default_rng(5)
    base_chars = np.array(list("ACGTN"))
    seqs = ["".join(rng.choice(base_chars, size=6000, p=[0.24, 0.24, 0.24, 0.24, 0.04])) for _ in range(4)]
    tokens = np.stack([sequence.tokenize_dna(s.encode(), 4) for s in seqs]).astype(np.int64)

    sys.path.insert(0, str(REFERENCE_ROOT))
    from genomad.neural_network import model as ref_model

    # Exactly the reference's production load path
    # (genomad/modules/nn_classification.py:309-310): rebuild the graph,
    # then load_weights from the .h5 — the patch tensors come from the
    # checkpoint, not from the rebuild's RNG.
    clf = ref_model.create_classifier()
    clf.load_weights(keras_artifacts["legacy"])
    want = clf.predict(tokens, batch_size=4, verbose=0)

    codes = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    bases = np.array([[codes[c] for c in s] for s in seqs], np.int32)
    got = np.asarray(igloo.apply_bases_tables(prepared, jnp.asarray(bases)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    got_onehot = np.asarray(igloo.apply_bases(prepared, jnp.asarray(bases)))
    np.testing.assert_allclose(got_onehot, want, atol=2e-5, rtol=1e-4)
