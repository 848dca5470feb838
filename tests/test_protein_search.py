"""Search-engine tests: SW kernel vs a full-DP numpy oracle, prefilter
recall on planted matches, end-to-end best-hit retrieval, and shard
invariance."""

import numpy as np
import pytest

from genomad_tpu.ops import profiledb, protein_search
from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB, encode_protein


def oracle_sw(residues, pssm, gap_open=11.0, gap_extend=1.0):
    """Full O(Lq*Lp) affine-gap local SW with explicit 3-state DP.

    Gap of length g costs open + (g-1)*extend. Returns (score, end_i, end_j).
    """
    Lq, Lp = len(residues), len(pssm)
    NEG = -1e9
    H = np.zeros((Lq + 1, Lp + 1))
    E = np.full((Lq + 1, Lp + 1), NEG)  # gap in query (consumes profile)
    F = np.full((Lq + 1, Lp + 1), NEG)  # gap in profile (consumes query)
    best, bi, bj = 0.0, 0, 0
    for i in range(1, Lq + 1):
        for j in range(1, Lp + 1):
            E[i][j] = max(H[i][j - 1] - gap_open, E[i][j - 1] - gap_extend)
            F[i][j] = max(H[i - 1][j] - gap_open, F[i - 1][j] - gap_extend)
            s = pssm[j - 1][residues[i - 1]] if residues[i - 1] < N_AA else 0.0
            H[i][j] = max(0.0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
            if H[i][j] > best:
                best, bi, bj = H[i][j], i - 1, j - 1
    return best, bi, bj


def random_pssm(rng, L):
    consensus = rng.integers(0, N_AA, L)
    pssm = rng.normal(-1.5, 1.0, (L, N_AA)).astype(np.float32)
    pssm[np.arange(L), consensus] += rng.uniform(4, 8, L)
    return pssm, consensus


def test_sw_matches_oracle(rng):
    for trial in range(5):
        Lq, Lp = int(rng.integers(10, 40)), int(rng.integers(10, 50))
        pssm, consensus = random_pssm(rng, Lp)
        residues = rng.integers(0, N_AA, Lq).astype(np.int8)
        # plant a partial consensus match for a nontrivial alignment
        m = min(Lq, Lp, 12)
        residues[:m] = consensus[:m]
        expected_score, ei, ej = oracle_sw(residues, pssm)
        q = np.full((1, 64), 20, np.int32)
        q[0, :Lq] = residues
        p = np.zeros((1, 64, N_AA), np.float32)
        p[0, :Lp] = pssm
        out = protein_search.sw_align(q, p, compute_starts=True)
        assert out["score"][0] == pytest.approx(expected_score, rel=1e-5), f"trial {trial}"
        assert out["end_i"][0] == ei and out["end_j"][0] == ej
        # reverse-pass invariant: same score from the end cell backwards
        assert out["score_rev"][0] == pytest.approx(expected_score, rel=1e-5)


def test_sw_with_gaps_matches_oracle(rng):
    """Alignment requiring an internal gap."""
    Lp = 30
    pssm, consensus = random_pssm(rng, Lp)
    # query = consensus with 3 positions deleted -> needs gap in query
    residues = np.delete(consensus, [10, 11, 12]).astype(np.int8)
    expected_score, ei, ej = oracle_sw(residues, pssm)
    q = np.full((1, 32), 20, np.int32)
    q[0, : len(residues)] = residues
    p = np.zeros((1, 32, N_AA), np.float32)
    p[0, :Lp] = pssm
    out = protein_search.sw_align(q, p)
    assert out["score"][0] == pytest.approx(expected_score, rel=1e-5)


def test_sw_batch_padding_invariance(rng):
    """Padding must not change scores."""
    pssm, consensus = random_pssm(rng, 20)
    residues = consensus[:15].astype(np.int8)
    for Lq_pad, Lp_pad in ((16, 20), (64, 128)):
        q = np.full((1, Lq_pad), 20, np.int32)
        q[0, :15] = residues
        p = np.zeros((1, Lp_pad, N_AA), np.float32)
        p[0, :20] = pssm
        out = protein_search.sw_align(q, p)
        expected, _, _ = oracle_sw(residues, pssm)
        assert out["score"][0] == pytest.approx(expected, rel=1e-5)


def test_prefilter_finds_planted_match(rng):
    db = ProfileDB.synthetic(seed=5, n_profiles=50, min_len=60, max_len=120)
    index = db.kmer_index(1)
    target = 17
    residues = db.consensus(target)[:80]
    cands, scores = protein_search.prefilter_query(residues, db, index)
    assert target in cands
    assert list(scores) == sorted(scores, reverse=True)
    # a random query should produce few/no candidates
    noise = rng.integers(0, N_AA, 80).astype(np.int8)
    noise_cands, _ = protein_search.prefilter_query(noise, db, index)
    assert len(noise_cands) < 5


def test_search_end_to_end():
    db = ProfileDB.synthetic(seed=11, n_profiles=120, min_len=60, max_len=200)
    rng = np.random.default_rng(42)
    query_names, query_seqs, expected = [], [], []
    for qi, target in enumerate([3, 50, 99]):
        cons = db.consensus(target)
        seq = cons.copy()
        # 10% random mutations
        n_mut = len(seq) // 10
        pos = rng.choice(len(seq), n_mut, replace=False)
        seq[pos] = rng.integers(0, N_AA, n_mut)
        query_names.append(f"contig1_{qi + 1}")
        query_seqs.append("".join(ALPHABET[r] for r in seq))
        expected.append(str(db.names[target]))
    hits = protein_search.search(query_names, query_seqs, db)
    assert set(hits) == set(query_names)
    for name, exp_target in zip(query_names, expected):
        target, ev, bits, taxid = hits[name]
        assert target == exp_target
        assert ev < 1e-3 and bits > 0
        assert taxid >= 1


def test_search_no_hits_for_noise():
    db = ProfileDB.synthetic(seed=13, n_profiles=80, min_len=60, max_len=150)
    rng = np.random.default_rng(0)
    seq = "".join(ALPHABET[r] for r in rng.integers(0, N_AA, 100))
    hits = protein_search.search(["q_1"], [seq], db)
    assert hits == {}


def test_search_sharded_matches_unsharded():
    db = ProfileDB.synthetic(seed=21, n_profiles=96, min_len=60, max_len=150)
    rng = np.random.default_rng(1)
    queries = []
    for target in (5, 40, 77):
        cons = db.consensus(target)
        queries.append("".join(ALPHABET[r] for r in cons))
    names = [f"q_{i}" for i in range(len(queries))]
    full = protein_search.search(names, queries, db)
    for n_shards in (2, 4):
        sharded = protein_search.search_sharded(names, queries, db, n_shards)
        assert set(sharded) == set(full)
        for q in full:
            assert sharded[q][0] == full[q][0], f"{n_shards} shards: {q}"
            assert sharded[q][2] == full[q][2]


def test_encode_protein_and_kmers():
    res = encode_protein("ACDX*")
    assert res.tolist() == [0, 1, 2, 20, 20]
    codes = profiledb.encode_kmers(np.array([0, 1, 2, 3, 4, 20, 0], dtype=np.int8), k=5)
    assert codes[0] == ((((0 * 20 + 1) * 20 + 2) * 20 + 3) * 20 + 4)
    assert codes[1] == -1 and codes[2] == -1  # windows touching the X


def test_evalue_bitscore_monotonicity():
    scores = np.array([50.0, 100.0, 200.0])
    bits = protein_search.bitscore(scores)
    assert (np.diff(bits) > 0).all()
    evs = protein_search.evalue(scores, 300, 1_000_000)
    assert (np.diff(evs) < 0).all()


def test_search_batch_size_invariance():
    """Results must be identical for any SW batch size (bucketing/padding
    must not affect scores)."""
    db = ProfileDB.synthetic(seed=33, n_profiles=100, min_len=60, max_len=200)
    rng = np.random.default_rng(3)
    names, seqs = [], []
    for qi, target in enumerate((10, 55, 80, 99)):
        seq = db.consensus(target).copy()
        pos = rng.choice(len(seq), len(seq) // 12, replace=False)
        seq[pos] = rng.integers(0, N_AA, len(pos))
        names.append(f"q{qi}")
        seqs.append("".join(ALPHABET[r] for r in seq))
    a = protein_search.search(names, seqs, db, batch_size=512)
    b = protein_search.search(names, seqs, db, batch_size=3)
    assert a == b


def test_max_rejected_mask_matches_sequential_oracle():
    """_max_rejected_mask must reproduce MMseqs2's sequential walk: align
    candidates in order, stop AFTER the R-th consecutive rejection."""
    rng = np.random.default_rng(99)

    def oracle(keep, carry, R):
        aligned = np.zeros(len(keep), bool)
        run = carry
        for i, k in enumerate(keep):
            aligned[i] = True
            run = 0 if k else run + 1
            if run >= R:
                return aligned, 0, True
        return aligned, run, False

    for trial in range(200):
        n_seg = int(rng.integers(1, 5))
        R = int(rng.integers(1, 6))
        seg_q, keep = [], []
        carries = np.zeros(10, np.int64)
        qids = rng.choice(10, n_seg, replace=False)
        qids.sort()
        for q in qids:
            m = int(rng.integers(1, 12))
            seg_q.extend([q] * m)
            keep.extend(rng.random(m) < 0.4)
            carries[q] = int(rng.integers(0, R))
        seg_q = np.asarray(seg_q, np.int64)
        keep = np.asarray(keep, bool)
        aligned, new_carry, stopped = protein_search._max_rejected_mask(
            seg_q, keep, carries.copy(), R
        )
        for si, q in enumerate(qids):
            m = seg_q == q
            exp_aligned, exp_carry, exp_stop = oracle(keep[m], carries[q], R)
            np.testing.assert_array_equal(
                aligned[m], exp_aligned, err_msg=f"trial {trial} q {q}"
            )
            assert new_carry[q] == exp_carry, (trial, q)
            assert stopped[si] == exp_stop, (trial, q)


def _gate_evs(db, names, seqs, targets):
    """Per-gene align-stage gate E-values (profile-as-query: K * plen *
    n_set * exp(-lambda*raw)), with raw recovered from the reported int
    bitscore (within 0.5 bit)."""
    full = protein_search.search(names, seqs, db, evalue_threshold=1e3)
    lam, kk = protein_search.KA_LAMBDA, protein_search.KA_K
    n_set = sum(len(s) for s in seqs)
    out = {}
    for n, t in zip(names, targets):
        assert full[n][0] == str(db.names[t]), (n, full[n])
        raw = (full[n][2] * protein_search.LN2 + np.log(kk)) / lam
        out[n] = kk * int(db.lengths[t]) * n_set * np.exp(-lam * raw)
    return out


def test_search_max_rejected_drops_later_accept():
    """--max-rejected walks each PROFILE's candidate-gene list in swapped
    prefilter order (ungapped score desc): a gene with a LOWER prefilter
    score but a HIGHER full-SW score than an earlier rejected gene is
    never aligned once the stop fires — the reference's heuristic loses
    that would-be accept, and so must this engine.

    g_frag: exact 40-residue consensus fragment -> high ungapped diagonal
    score, modest total SW score. g_mut: full-length homolog with every
    3rd residue mutated -> every diagonal window is interrupted (lower
    prefilter score) but the total SW score is far higher."""
    db = ProfileDB.synthetic(
        seed=41, n_profiles=300, min_len=100, max_len=140, integral=True
    )
    target = 57
    cons = db.consensus(target)
    rng = np.random.default_rng(2)
    mut = cons.copy()
    pos = np.arange(0, len(mut), 3)
    mut[pos] = (mut[pos] + 1 + rng.integers(0, N_AA - 1, len(pos))) % N_AA
    names = ["g_frag", "g_mut"]
    seqs = [
        "".join(ALPHABET[r] for r in cons[:40]),
        "".join(ALPHABET[r] for r in mut),
    ]
    evs = _gate_evs(db, names, seqs, [target, target])
    # the full-length homolog out-scores the fragment by a wide margin
    assert evs["g_mut"] * 1e4 < evs["g_frag"], evs
    thr = float(np.sqrt(evs["g_mut"] * evs["g_frag"]))
    # no stop rule: g_mut passes the gate, g_frag is rejected by E
    base = protein_search.search(
        names, seqs, db, evalue_threshold=thr, max_rejected=0
    )
    assert base.get("g_mut", ("",))[0] == str(db.names[target])
    assert "g_frag" not in base
    # stop rule at 1: g_frag walks FIRST (higher prefilter score), its
    # rejection stops the profile's list, and g_mut is never aligned
    trunc = protein_search.search(
        names, seqs, db, evalue_threshold=thr, max_rejected=1
    )
    assert "g_mut" not in trunc and "g_frag" not in trunc
    # an ACCEPT before the weaker candidate resets the run instead:
    # threshold admitting both keeps both
    both = protein_search.search(
        names, seqs, db, evalue_threshold=float(evs["g_frag"] * 4), max_rejected=1
    )
    assert both.get("g_mut", ("",))[0] == str(db.names[target])
    assert both.get("g_frag", ("",))[0] == str(db.names[target])


def test_profile_major_mode_matches_streaming(monkeypatch):
    """The large-input profile-major scheduler (prefilter-all ->
    per-profile walk with early stop) must produce the IDENTICAL hit
    table as the streaming mode (align-all + post-hoc stop) — both are
    bit-equal realizations of the reference's sequential walk. Tiny
    rounds force multi-round carry of rejection runs."""
    monkeypatch.setattr(protein_search, "_PM_ROUND", 4)
    db = ProfileDB.synthetic(
        seed=91, n_profiles=400, min_len=60, max_len=150, integral=True
    )
    rng = np.random.default_rng(6)
    names, seqs = [], []
    for qi in range(40):
        if qi % 3 < 2:
            t = int(rng.integers(0, 400))
            seq = db.consensus(t).copy()
            pos = rng.choice(len(seq), max(1, len(seq) // 8), replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        else:
            seq = rng.integers(0, N_AA, int(rng.integers(60, 150)))
        names.append(f"g_{qi}")
        seqs.append("".join(ALPHABET[r] for r in seq))
    for kwargs in (
        {},
        {"max_rejected": 1, "evalue_threshold": 1e-12},
        {"max_rejected": 0},
        {"max_rejected": 2, "evalue_threshold": 1e-25},
    ):
        stream = protein_search.search(
            names, seqs, db, profile_major=False, **kwargs
        )
        pmajor = protein_search.search(
            names, seqs, db, profile_major=True, **kwargs
        )
        assert stream == pmajor, kwargs


def test_prestage_thread_path_large_db():
    """DBs past the prestage threshold (4096 profiles) stage their buckets
    from a background thread overlapped with the prefilter; results must
    be unaffected and the bucket cache populated exactly once."""
    db = ProfileDB.synthetic(
        seed=55, n_profiles=4200, min_len=30, max_len=60, integral=True
    )
    rng = np.random.default_rng(4)
    names, seqs = [], []
    for qi, t in enumerate((7, 1033, 4100)):
        seq = db.consensus(t).copy()
        pos = rng.choice(len(seq), max(1, len(seq) // 10), replace=False)
        seq[pos] = rng.integers(0, N_AA, len(pos))
        names.append(f"g_{qi}")
        seqs.append("".join(ALPHABET[r] for r in seq))
    hits = protein_search.search(names, seqs, db)
    for qi, t in enumerate((7, 1033, 4100)):
        assert hits[f"g_{qi}"][0] == str(db.names[t])
    assert db.__dict__.get("_device_buckets"), "prestage cache empty"


def test_long_profile_and_query_buckets():
    """Profiles/queries in the 768/1024 length classes: bucket staging,
    the capped chunk sizes, and the pad-clamp see real traffic (every
    other fixture stays under 400 residues; the 4096 class was measured
    once and dropped from CI — its compile alone costs minutes on the
    CPU backend)."""
    rng = np.random.default_rng(31)
    names, pssms = [], []
    for i, L in enumerate([80, 300, 600, 700, 900] * 3):
        cons = rng.integers(0, N_AA, L)
        pssm = np.full((L, N_AA), -2.0, np.float32)
        pssm[np.arange(L), cons] = 6.0
        names.append(f"p{i}")
        pssms.append(pssm)
    db = ProfileDB.from_profiles(names, pssms)
    # all-pairs mode (small DB): every length class aligns
    targets = [2, 3, 4]  # the 600/700/900-length profiles
    qnames, qseqs = [], []
    for qi, t in enumerate(targets):
        cons = db.profile(t).argmax(1)
        seq = cons.copy()
        pos = rng.choice(len(seq), len(seq) // 10, replace=False)
        seq[pos] = rng.integers(0, N_AA, len(pos))
        qnames.append(f"g_{qi}")
        qseqs.append("".join(ALPHABET[r] for r in seq))
    hits = protein_search.search(qnames, qseqs, db)
    for qi, t in enumerate(targets):
        assert hits[f"g_{qi}"][0] == f"p{t}", (qi, hits.get(f"g_{qi}"))
