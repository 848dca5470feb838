"""CRF marginal tests (vs brute-force path enumeration) and forest evaluator
tests (vs scalar traversal oracle + UBJSON round-trip)."""

import itertools

import numpy as np

from genomad_tpu.models import crf, forest


# ---------------------------------------------------------------------------
# CRF
# ---------------------------------------------------------------------------


def brute_force_marginal_v(spm_v, spm_c):
    """P(label_i = V) by enumerating all 2^n labelings (0 = V, 1 = host)."""
    n = len(spm_v)
    state = np.stack([spm_v, spm_c], 1) @ crf.STATE_WEIGHTS  # (n, 2)
    probs = np.zeros(n)
    z = 0.0
    for labels in itertools.product([0, 1], repeat=n):
        score = sum(state[i, l] for i, l in enumerate(labels))
        score += sum(
            crf.TRANSITION_WEIGHTS[labels[i], labels[i + 1]] for i in range(n - 1)
        )
        w = np.exp(score)
        z += w
        for i, l in enumerate(labels):
            if l == 0:
                probs[i] += w
    return probs / z


def brute_force_score(spm_v, spm_c):
    fg = brute_force_marginal_v(spm_v, spm_c)
    bg = brute_force_marginal_v(np.zeros_like(spm_v), np.zeros_like(spm_c))
    return 1 / (1 + np.exp(-(fg - bg) / 0.2))


def test_crf_marginals_match_brute_force(rng):
    for n in (1, 2, 3, 7):
        spm_v = rng.uniform(0, 1, n)
        spm_c = rng.uniform(0, 1, n)
        expected = brute_force_score(spm_v, spm_c)
        got = crf.score_provirus_genes(spm_v, spm_c)
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_crf_batch_matches_single(rng):
    lists_v = [rng.uniform(0, 1, n) for n in (3, 8, 1, 5)]
    lists_c = [rng.uniform(0, 1, n) for n in (3, 8, 1, 5)]
    batch = crf.score_provirus_genes_batch(lists_v, lists_c)
    for v, c, got in zip(lists_v, lists_c, batch):
        single = crf.score_provirus_genes(v, c)
        np.testing.assert_allclose(got, single, rtol=1e-5, atol=1e-6)


def test_crf_virus_genes_score_high():
    """Genes with high virus SPM should get scores near 1, host genes near 0."""
    spm_v = np.array([0.9, 0.95, 0.9, 0.0, 0.0, 0.0])
    spm_c = np.array([0.0, 0.0, 0.0, 0.9, 0.95, 0.9])
    scores = crf.score_provirus_genes(spm_v, spm_c)
    assert (scores[:3] > 0.8).all()
    assert (scores[3:] < 0.2).all()


# ---------------------------------------------------------------------------
# Forest
# ---------------------------------------------------------------------------


def test_forest_vectorized_matches_oracle(rng):
    f = forest.synthetic_forest(seed=3, n_trees=12, n_features=10, depth=3)
    X = rng.uniform(0, 1, (20, 10)).astype(np.float32)
    expected = f.predict_margin_np(X)
    got = f.predict_margin(X)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_forest_nan_uses_default_direction():
    f = forest.synthetic_forest(seed=1, n_trees=4, n_features=5, depth=2)
    X = np.full((3, 5), np.nan, np.float32)
    expected = f.predict_margin_np(X)
    got = f.predict_margin(X)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_forest_ubj_roundtrip(tmp_path, rng):
    f = forest.synthetic_forest(seed=7, n_trees=9, n_features=25, depth=4)
    path = tmp_path / "forest.ubj"
    forest.write_ubj(f, path)
    loaded = forest.Forest.from_ubj(path)
    assert loaded.n_classes == 3
    X = rng.uniform(0, 1, (10, 25)).astype(np.float32)
    np.testing.assert_allclose(loaded.predict_margin(X), f.predict_margin(X), rtol=1e-5)


def test_ubjson_decoder_generic():
    # hand-built UBJSON: {"a": [1, 2.5, "x"], "b": true, "c": null}
    payload = forest.encode_ubjson({"a": [1, 2.5, "x"], "b": True, "c": None})
    decoded = forest.parse_ubjson(payload)
    assert decoded == {"a": [1, 2.5, "x"], "b": True, "c": None}


def test_ubjson_typed_arrays():
    arr = np.arange(5, dtype=np.int32)
    decoded = forest.parse_ubjson(forest.encode_ubjson({"x": arr}))
    np.testing.assert_array_equal(decoded["x"], arr)
    farr = np.linspace(0, 1, 4, dtype=np.float32)
    decoded = forest.parse_ubjson(forest.encode_ubjson({"x": farr}))
    np.testing.assert_allclose(decoded["x"], farr)
