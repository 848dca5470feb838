"""Native (C++) prefilter: build + parity with the numpy implementation."""

import numpy as np
import pytest

from genomad_tpu import native
from genomad_tpu.ops import protein_search
from genomad_tpu.ops.profiledb import ProfileDB, encode_protein


@pytest.fixture(scope="module")
def lib():
    lib = native.get_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def assert_cands_equal(got, expected):
    """Same candidate id set, near-identical scores, and both orderings
    consistent with (score desc, id asc). Scores may differ at float
    rounding (C++ sequential Kadane vs numpy f64 cumsum max-subarray)."""
    got_ids, got_scores = got
    exp_ids, exp_scores = expected
    np.testing.assert_array_equal(np.sort(got_ids), np.sort(exp_ids))
    by_id_got = dict(zip(got_ids.tolist(), got_scores.tolist()))
    by_id_exp = dict(zip(exp_ids.tolist(), exp_scores.tolist()))
    for pid in by_id_got:
        np.testing.assert_allclose(by_id_got[pid], by_id_exp[pid], rtol=1e-5)
    for ids, scores in (got, expected):
        key = [(-s, i) for s, i in zip(np.round(scores, 3), ids)]
        assert key == sorted(key), "candidates not in (score desc, id asc) order"


def test_native_matches_numpy_prefilter(lib, rng):
    db = ProfileDB.synthetic(seed=31, n_profiles=60, min_len=60, max_len=150)
    index = db.kmer_index(1)
    for target in (0, 17, 59):
        residues = db.consensus(target)[:90]
        expected = protein_search.prefilter_query(residues, db, index, 25.0)
        got = native.native_prefilter_query(index, residues, db, 25.0)
        assert got is not None
        assert_cands_equal(got, expected)
        assert target in got[0]
    # noise query: both paths agree
    noise = rng.integers(0, 20, 90).astype(np.int8)
    expected = protein_search.prefilter_query(noise, db, index, 25.0)
    got = native.native_prefilter_query(index, noise, db, 25.0)
    assert_cands_equal(got, expected)


def test_native_batch_matches_single(lib, rng):
    """Batch == query-by-query, across GROUP boundaries: the native engine
    scans candidates of up to 16 queries jointly (grouped radix sweep), so
    the query list deliberately exceeds one group and ends on a partial
    group — per-query results must be identical either way."""
    db = ProfileDB.synthetic(seed=41, n_profiles=40, min_len=60, max_len=120)
    index = db.kmer_index(1)
    residues_list = [db.consensus(t % 40)[:80] for t in (2, 9, 33, *range(14))]
    residues_list.append(rng.integers(0, 20, 70).astype(np.int8))
    assert len(residues_list) == 18  # one full 16-query group + a partial
    ids_list, scores_list, dropped = native.native_prefilter_batch(
        index, residues_list, db, 25.0, n_threads=2
    )
    assert dropped == 0
    for residues, ids, scores in zip(residues_list, ids_list, scores_list):
        single = native.native_prefilter_query(index, residues, db, 25.0)
        assert_cands_equal((ids, scores), single)


def test_native_expansion_matches_numpy(lib, rng):
    """Query-side similar-k-mer expansion: the C++ path must (a) never
    select a candidate the exact >=2-hits-per-diagonal criterion rejects
    (its stamp tables keep only the LAST diagonal per profile — MMseqs2's
    QueryMatcher approximation, so native ⊆ exact), (b) keep recall on
    planted targets, and (c) score shared candidates identically."""
    from genomad_tpu.ops.blosum import kmer_score_threshold

    db = ProfileDB.synthetic(seed=77, n_profiles=50, min_len=60, max_len=140)
    index = db.kmer_index(1)
    for s in (1.0, 4.2, 8.2):
        thr = kmer_score_threshold(s)
        queries = [db.consensus(t)[:70] for t in (3, 21)]
        queries.append(rng.integers(0, 20, 80).astype(np.int8))
        for target, residues in zip((3, 21, None), queries):
            exp_ids, exp_scores = protein_search.prefilter_query(
                residues, db, index, 25.0, kmer_thr=thr
            )
            got_ids, got_scores = native.native_prefilter_query(
                index, residues, db, 25.0, kmer_thr=thr
            )
            assert set(got_ids) <= set(exp_ids)
            if target is not None:
                assert target in got_ids
            by_id_exp = dict(zip(exp_ids.tolist(), exp_scores.tolist()))
            for pid, score in zip(got_ids.tolist(), got_scores.tolist()):
                # exact-mode scores are an upper bound: the stamp path may
                # miss a qualifying diagonal of a still-selected profile
                assert score <= by_id_exp[pid] + 1e-4
            key = [(-s_, i) for s_, i in zip(np.round(got_scores, 3), got_ids)]
            assert key == sorted(key), "not in (score desc, id asc) order"


def test_expansion_recall_grows_with_sensitivity(rng):
    """A mutated query missed by exact consensus k-mers is recovered once
    the similar-k-mer lists grow (the MMseqs2 ``-s`` recall mechanism)."""
    from genomad_tpu.ops.blosum import kmer_score_threshold

    db = ProfileDB.synthetic(seed=13, n_profiles=40, min_len=80, max_len=160)
    index = db.kmer_index(1)
    hits_by_s = {}
    for s in (1.0, 4.2, 8.2):
        thr = kmer_score_threshold(s)
        n_hits = 0
        for target in range(12):
            residues = db.consensus(target)[:80].copy()
            residues[::2] = (residues[::2] + 7) % 20  # mutate every 2nd residue
            cands, _ = protein_search.prefilter_query(
                residues, db, index, 25.0, kmer_thr=thr
            )
            n_hits += int(target in cands)
        hits_by_s[s] = n_hits
    assert hits_by_s[8.2] >= hits_by_s[4.2] >= hits_by_s[1.0]
    assert hits_by_s[8.2] > hits_by_s[1.0]


def test_native_int8_scan_matches_f32(lib, rng):
    """On an integral-score DB (the shape of real profile databases) the
    native engine auto-selects the int8 scan; scores and ordering must be
    BIT-EQUAL to the f32 reference paths — int32 accumulation over int8
    rows is exact for integral values."""
    db = ProfileDB.synthetic(
        seed=19, n_profiles=60, min_len=60, max_len=150, integral=True
    )
    assert db.pssm_i8 is not None  # integral DB -> int8 path active
    index = db.kmer_index(1)
    from genomad_tpu.ops.blosum import kmer_score_threshold

    for kmer_thr in (None, kmer_score_threshold(4.2)):
        for target in (0, 29, 59):
            residues = db.consensus(target)[:90]
            expected = protein_search.prefilter_query(
                residues, db, index, 25.0, kmer_thr=kmer_thr
            )
            got = native.native_prefilter_query(
                index, residues, db, 25.0, kmer_thr=kmer_thr
            )
            assert got is not None
            if kmer_thr is None:
                assert_cands_equal(got, expected)
                # integral values: scores agree EXACTLY, not just rtol
                by_exp = dict(zip(expected[0].tolist(), expected[1].tolist()))
                for pid, s in zip(got[0].tolist(), got[1].tolist()):
                    assert s == by_exp[pid]
            else:
                assert set(got[0]) <= set(expected[0])
                assert target in got[0]

    # non-integral DB keeps the f32 scan (no quantization ever)
    db_f = ProfileDB.synthetic(seed=19, n_profiles=10, min_len=60, max_len=90)
    assert db_f.pssm_i8 is None


def test_native_handles_unknown_residues(lib):
    db = ProfileDB.synthetic(seed=5, n_profiles=20, min_len=60, max_len=100)
    index = db.kmer_index(1)
    residues = encode_protein("X" * 50)
    got = native.native_prefilter_query(index, residues, db, 25.0)
    assert got is not None and len(got[0]) == 0


# --- composition-bias correction (MMseqs2 --comp-bias-corr 1) --------------


def test_comp_bias_matches_direct_formula():
    """blosum.comp_bias (vectorized) vs a literal loop transcription of
    MMseqs2's SubstitutionMatrix::calcLocalAaBiasCorrection."""
    from genomad_tpu.ops import blosum
    from genomad_tpu.ops.statistics import BACKGROUND_FREQS

    rng = np.random.default_rng(17)
    for L in (1, 5, 30, 41, 200):
        res = rng.integers(0, 20, L).astype(np.int8)
        if L > 10:
            res[3] = 20  # an invalid (X) position
        got = blosum.comp_bias(res)
        B = blosum.BLOSUM62
        want = np.zeros(L, np.int32)
        for i in range(L):
            if res[i] >= 20 or L < 2:
                continue
            lo, hi = max(0, i - 20), min(L, i + 20)
            wl = hi - lo
            if wl <= 1:
                continue
            s = sum(
                B[res[i], res[j]] for j in range(lo, hi) if res[j] < 20
            ) - B[res[i], res[i]]
            delta = -s / (wl - 1) + float(B[res[i]] @ BACKGROUND_FREQS)
            want[i] = int(np.floor(delta + 0.5))
        np.testing.assert_array_equal(got, want, err_msg=f"L={L}")


def test_native_bias_matches_numpy_exact_mode(lib):
    """Exact-k-mer mode scans full diagonals in both paths: with bias the
    candidate sets and scores must stay bit-equal."""
    from genomad_tpu.ops import blosum

    db = ProfileDB.synthetic(
        seed=61, n_profiles=80, min_len=60, max_len=150, integral=True
    )
    index = db.kmer_index(1)
    for target in (3, 40, 79):
        residues = db.consensus(target)[:90]
        bias = blosum.comp_bias(residues)
        expected = protein_search.prefilter_query(
            residues, db, index, 25.0, bias=bias
        )
        got = native.native_prefilter_query(
            index, residues, db, 25.0, bias=bias
        )
        assert got is not None
        assert_cands_equal(got, expected)


def test_native_bias_expansion_subset_of_exact(lib):
    """Expansion mode with bias: the native engine's stamp-table/window
    approximations make it a SUBSET of the exact numpy criterion, with
    per-profile scores never exceeding the exact full-diagonal score —
    the same relationship as without bias."""
    from genomad_tpu.ops import blosum

    db = ProfileDB.synthetic(
        seed=71, n_profiles=500, min_len=60, max_len=200, integral=True
    )
    index = db.kmer_index(1)
    rng = np.random.default_rng(2)
    thr = blosum.kmer_score_threshold(4.2)
    for trial in range(6):
        t = int(rng.integers(0, 500))
        seq = db.consensus(t).copy()
        pos = rng.choice(len(seq), len(seq) // 8, replace=False)
        seq[pos] = rng.integers(0, 20, len(pos))
        seq = seq.astype(np.int8)
        bias = blosum.comp_bias(seq)
        ids_e, sc_e = protein_search.prefilter_query(
            seq, db, index, 25.0, kmer_thr=thr, bias=bias,
            max_candidates=db.n_profiles,
        )
        res = native.native_prefilter_batch(
            index, [seq], db, 25.0, kmer_thr=thr,
            max_out_per_query=db.n_profiles, bias_list=[bias],
        )
        assert res is not None
        ids_n, sc_n = res[0][0], res[1][0]
        exact = dict(zip(ids_e.tolist(), sc_e.tolist()))
        for pid, s in zip(ids_n.tolist(), sc_n.tolist()):
            assert pid in exact, f"trial {trial}: native-only candidate {pid}"
            assert s <= exact[pid] + 1e-5
        assert t in ids_n.tolist(), f"trial {trial}: planted target missed"


def test_bias_prunes_low_complexity_candidates():
    """A low-complexity query against a DB seeded with a low-complexity
    profile: the bias correction must cut its candidate list (that is the
    point of MMseqs2's default) while a planted true homolog search keeps
    its target."""
    from genomad_tpu.ops import blosum
    from genomad_tpu.ops.profiledb import N_AA

    rng = np.random.default_rng(5)
    names, pssms = [], []
    # 300 normal profiles + 20 low-complexity (A/L-repeat) profiles
    base = ProfileDB.synthetic(
        seed=13, n_profiles=300, min_len=60, max_len=120, integral=True
    )
    for i in range(300):
        names.append(f"n{i}")
        pssms.append(base.profile(i))
    for i in range(20):
        L = 80
        cons = np.array(([0] * 6 + [9] * 6) * 7)[:L]
        pssm = np.full((L, N_AA), -2.0, np.float32)
        pssm[np.arange(L), cons] = 6.0
        names.append(f"lc{i}")
        pssms.append(pssm)
    db = ProfileDB.from_profiles(names, pssms)
    index = db.kmer_index(1)
    thr = blosum.kmer_score_threshold(4.2)

    lc_query = np.array(([0] * 6 + [9] * 6) * 10, np.int8)
    i0, _ = protein_search.prefilter_query(
        lc_query, db, index, 25.0, kmer_thr=thr, max_candidates=400
    )
    bias = blosum.comp_bias(lc_query)
    assert bias.min() < 0, "low-complexity run must get negative bias"
    i1, _ = protein_search.prefilter_query(
        lc_query, db, index, 25.0, kmer_thr=thr, max_candidates=400, bias=bias
    )
    assert len(i1) < len(i0), (len(i0), len(i1))

    # a diverse true homolog keeps its planted target under bias
    t = 123
    seq = base.consensus(t).astype(np.int8)
    i2, _ = protein_search.prefilter_query(
        seq, db, index, 25.0, kmer_thr=thr, max_candidates=400,
        bias=blosum.comp_bias(seq),
    )
    assert t in i2


def test_prefilter_thread_count_invariance(lib):
    """Identical per-query results at any thread count (the batch driver
    hands whole 16-query groups to workers; grouping, not threading,
    defines the scan batches)."""
    from genomad_tpu.ops import blosum

    db = ProfileDB.synthetic(
        seed=83, n_profiles=800, min_len=60, max_len=200, integral=True
    )
    index = db.kmer_index(1)
    rng = np.random.default_rng(11)
    thr = blosum.kmer_score_threshold(4.2)
    queries = []
    for qi in range(40):  # > 2 full groups + a partial group
        t = int(rng.integers(0, 800))
        seq = db.consensus(t).copy()
        pos = rng.choice(len(seq), len(seq) // 9, replace=False)
        seq[pos] = rng.integers(0, 20, len(pos))
        queries.append(seq.astype(np.int8))
    bias_list = [blosum.comp_bias(q) for q in queries]
    ref = None
    for n_threads in (1, 2, 4):
        res = native.native_prefilter_batch(
            index, queries, db, 25.0, kmer_thr=thr,
            max_out_per_query=800, n_threads=n_threads, bias_list=bias_list,
        )
        assert res is not None
        if ref is None:
            ref = res
            continue
        for q in range(len(queries)):
            np.testing.assert_array_equal(
                res[0][q], ref[0][q], err_msg=f"t={n_threads} q={q} ids"
            )
            np.testing.assert_array_equal(
                res[1][q], ref[1][q], err_msg=f"t={n_threads} q={q} scores"
            )
        assert res[2] == ref[2]


def test_native_bias_property_fuzz(lib):
    """Property fuzz of the C++ path vs numpy across adversarial inputs:
    random integral DBs, queries with X runs, near-k-length queries, long
    homopolymer stretches, and bias on/off — exact-k-mer mode must be
    bit-equal (both scan full diagonals); expansion mode must stay a
    subset with scores bounded by the exact full-diagonal value."""
    from genomad_tpu.ops import blosum

    rng = np.random.default_rng(123)
    thr = blosum.kmer_score_threshold(4.2)
    for trial in range(12):
        n_prof = int(rng.integers(40, 400))
        db = ProfileDB.synthetic(
            seed=2000 + trial, n_profiles=n_prof,
            min_len=int(rng.integers(8, 30)), max_len=int(rng.integers(40, 250)),
            integral=True,
        )
        index = db.kmer_index(1)
        queries = []
        for qi in range(6):
            kind = (trial + qi) % 4
            if kind == 0:  # mutated planted
                t = int(rng.integers(0, n_prof))
                seq = db.consensus(t).copy()
                pos = rng.choice(len(seq), max(1, len(seq) // 6), replace=False)
                seq[pos] = rng.integers(0, 20, len(pos))
            elif kind == 1:  # X runs
                t = int(rng.integers(0, n_prof))
                seq = db.consensus(t).copy()
                a = int(rng.integers(0, max(1, len(seq) - 6)))
                seq[a : a + 6] = 20
            elif kind == 2:  # near-k-length
                seq = rng.integers(0, 20, int(rng.integers(5, 9)))
            else:  # homopolymer + tail
                seq = np.concatenate([
                    np.full(int(rng.integers(20, 60)), int(rng.integers(0, 20))),
                    rng.integers(0, 20, 30),
                ])
            queries.append(np.ascontiguousarray(seq, np.int8))
        for use_bias in (False, True):
            bias_list = (
                [blosum.comp_bias(q) for q in queries] if use_bias else None
            )
            # exact-k-mer mode: full-diagonal scans, bit-equal required
            res = native.native_prefilter_batch(
                index, queries, db, 25.0, max_out_per_query=n_prof,
                bias_list=bias_list,
            )
            assert res is not None
            for q in range(len(queries)):
                b = bias_list[q] if use_bias else None
                ids_e, sc_e = protein_search.prefilter_query(
                    queries[q], db, index, 25.0, max_candidates=n_prof, bias=b
                )
                np.testing.assert_array_equal(
                    res[0][q], ids_e,
                    err_msg=f"trial {trial} q {q} bias={use_bias} ids",
                )
                np.testing.assert_allclose(
                    res[1][q], sc_e, rtol=1e-5,
                    err_msg=f"trial {trial} q {q} bias={use_bias} scores",
                )
            # expansion mode: subset + score bound
            res = native.native_prefilter_batch(
                index, queries, db, 25.0, kmer_thr=thr,
                max_out_per_query=n_prof, bias_list=bias_list,
            )
            for q in range(len(queries)):
                b = bias_list[q] if use_bias else None
                ids_e, sc_e = protein_search.prefilter_query(
                    queries[q], db, index, 25.0, max_candidates=n_prof,
                    kmer_thr=thr, bias=b,
                )
                exact = dict(zip(ids_e.tolist(), sc_e.tolist()))
                for pid, s in zip(res[0][q].tolist(), res[1][q].tolist()):
                    assert pid in exact, (trial, q, use_bias, pid)
                    assert s <= exact[pid] + 1e-4, (trial, q, use_bias, pid)
