"""Karlin-Altschul calibration: Gumbel MLE recovery + calibrated E-values."""

import numpy as np
import pytest

from genomad_tpu.ops import protein_search, statistics
from genomad_tpu.ops.profiledb import ProfileDB


def test_fit_gumbel_recovers_parameters():
    """MLE on synthetic Gumbel draws recovers (lambda, K) within ~10%."""
    rng = np.random.default_rng(3)
    lam_true, k_true = 0.30, 0.05
    mn = rng.integers(10_000, 80_000, 4000).astype(np.float64)
    # S = u + G/lambda with G standard Gumbel, u = ln(K mn)/lambda
    u = np.log(k_true * mn) / lam_true
    scores = u + rng.gumbel(0.0, 1.0 / lam_true, len(mn))
    lam, k = statistics.fit_gumbel(scores, mn)
    assert abs(lam - lam_true) / lam_true < 0.10
    assert abs(np.log(k / k_true)) < 0.5  # K is exponentially sensitive


def test_calibrated_evalues_are_calibrated():
    """With fitted (lambda, K), the expected number of null pairs with
    E <= t is ~t per query — the defining property of an E-value."""
    db = ProfileDB.synthetic(seed=11, n_profiles=48, min_len=80, max_len=240)
    scores, mn = statistics.sample_null_scores(
        db, n_queries=48, query_length=150, profiles_per_query=12, seed=5
    )
    lam, k = statistics.fit_gumbel(scores, mn)
    # per-pair E-values vs the sampled search space (sum of mn per query)
    n_queries = 48
    space = mn.reshape(n_queries, -1).sum(axis=1, keepdims=True)
    pair_scores = scores.reshape(n_queries, -1)
    ev = (space / 150.0) * 150.0 * np.exp2(
        -((lam * pair_scores - np.log(k)) / np.log(2.0))
    )
    # count of pairs below t across all queries ~ Poisson(t * n_queries)
    for t, lo, hi in ((1.0, 10, 200), (5.0, 60, 900)):
        n_below = int((ev <= t).sum())
        assert lo <= n_below <= hi, (t, n_below)


def test_calibrate_db_attaches_and_persists(tmp_path):
    db = ProfileDB.synthetic(seed=2, n_profiles=24, min_len=60, max_len=120)
    lam, k = statistics.calibrate_db(
        db, n_queries=16, query_length=100, profiles_per_query=8, seed=1
    )
    assert 0.01 < lam < 2.0 and k > 0
    path = tmp_path / "db.npz"
    db.save(path)
    loaded = ProfileDB.load(path)
    assert loaded.ka_lambda == pytest.approx(lam)
    assert loaded.ka_k == pytest.approx(k)
    shard = loaded.shard(3, 1)
    assert shard.ka_lambda == pytest.approx(lam)


def test_search_uses_calibrated_stats():
    """search() must produce different E-values once the DB carries its own
    fitted statistics (and identical hits when the fit equals the default)."""
    db = ProfileDB.synthetic(seed=7, n_profiles=40, min_len=60, max_len=120)
    names = ["q0"]
    from genomad_tpu.ops.profiledb import ALPHABET

    seq = "".join(ALPHABET[r] for r in db.consensus(5))
    base = protein_search.search(names, [seq], db, skip_prefilter=True)
    db.ka_lambda, db.ka_k = 0.5, 0.01
    recal = protein_search.search(names, [seq], db, skip_prefilter=True)
    assert base["q0"][0] == recal["q0"][0]  # same best hit
    assert base["q0"][1] != recal["q0"][1]  # different E-value
