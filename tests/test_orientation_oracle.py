"""Golden oracle for the align-stage PROFILE-AS-QUERY orientation.

The reference runs both align passes with the profile DB as the query
(`mmseqs align <profileDB> <queryDB>` — genomad/mmseqs2.py:107-140), so
every gate is profile-oriented: the `-e` gate uses m = profile length and
n = the protein query set's residue count, `--cov-mode 2 -c 0.2` demands
>= 20% of the PROFILE covered, `--max-rejected 280` walks each PROFILE's
candidate-gene list, and the swapped-back best hit is the head of each
gene's Matcher::compareHits-sorted list (int bitscore desc, profile length
asc, profile id asc).

This file pins the engine to that orientation with a hand-written numpy
oracle: a classic 3-state local-SW DP plus a SEQUENTIAL per-profile
accept/reject walk — sharing no code with the engine's batched/vectorized
implementation — run over randomized queries at several thresholds and
max-rejected settings, and compared hit-table-for-hit-table.
"""

import math
from collections import defaultdict

import numpy as np
import pytest

from genomad_tpu.ops import blosum, protein_search
from genomad_tpu.ops.profiledb import ALPHABET, N_AA, ProfileDB, encode_protein
from genomad_tpu.ops.protein_search import KA_K, KA_LAMBDA, LN2


# ---------------------------------------------------------------------------
# Independent oracle implementation
# ---------------------------------------------------------------------------


def _full_sw(residues, pssm, gap_open=11.0, gap_extend=1.0):
    """Classic 3-state affine local SW. Returns (score, end_i, end_j)."""
    Lq, Lp = len(residues), len(pssm)
    NEG = -1e9
    H = np.zeros((Lq + 1, Lp + 1))
    E = np.full((Lq + 1, Lp + 1), NEG)
    F = np.full((Lq + 1, Lp + 1), NEG)
    best, bi, bj = 0.0, 0, 0
    for i in range(1, Lq + 1):
        ri = residues[i - 1]
        for j in range(1, Lp + 1):
            E[i][j] = max(H[i][j - 1] - gap_open, E[i][j - 1] - gap_extend)
            F[i][j] = max(H[i - 1][j] - gap_open, F[i - 1][j] - gap_extend)
            s = pssm[j - 1][ri] if ri < N_AA else 0.0
            H[i][j] = max(0.0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
            if H[i][j] > best:
                best, bi, bj = H[i][j], i - 1, j - 1
    return best, bi, bj


def _sw_starts(residues, pssm, end_i, end_j):
    """Alignment start cell: rerun the DP on the reversed prefixes."""
    rq = residues[: end_i + 1][::-1]
    rp = pssm[: end_j + 1][::-1]
    _, rei, rej = _full_sw(rq, rp)
    return end_i - rei, end_j - rej


def oracle_chain(
    db,
    res_list,
    evalue_thr,
    min_cov,
    max_rejected,
    sensitivity=4.2,
    lam=KA_LAMBDA,
    kk=KA_K,
):
    """The reference's swapped align chain, walked sequentially.

    Stage 1 (per-gene prefilter) comes from the engine's own
    prefilter_query — the prefilter is pinned by its own tests; this
    oracle pins everything DOWNSTREAM of the swap. Returns
    ({query_index: (profile_id, E_report, int_bits, taxid)}, n_stopped).
    """
    n_gate = max(sum(len(r) for r in res_list), 1)
    index = db.kmer_index(1)
    kmer_thr = blosum.kmer_score_threshold(sensitivity)
    per_profile = defaultdict(list)
    for qi, r in enumerate(res_list):
        ids, scores = protein_search.prefilter_query(
            r, db, index, 25.0, max_candidates=db.n_profiles,
            kmer_thr=kmer_thr, bias=blosum.comp_bias(r),
        )
        for pid, s in zip(ids, scores):
            per_profile[int(pid)].append((float(s), qi))

    sw_cache = {}

    def sw(qi, pid):
        if (qi, pid) not in sw_cache:
            sw_cache[(qi, pid)] = _full_sw(res_list[qi], db.profile(pid))
        return sw_cache[(qi, pid)]

    # pass 1: per-PROFILE sequential walk, swapped prefilter order
    # (ungapped score desc, gene index asc), E gate with m = profile len
    # and n = protein-set residues, stop at the max_rejected-th
    # consecutive rejection
    pass1 = []
    n_stopped = 0
    for pid in sorted(per_profile):
        lst = sorted(per_profile[pid], key=lambda t: (-t[0], t[1]))
        plen = int(db.lengths[pid])
        run = 0
        for s, qi in lst:
            raw, ei, ej = sw(qi, pid)
            ev = kk * plen * n_gate * math.exp(-lam * raw)
            if ev <= evalue_thr:
                run = 0
                pass1.append((qi, pid, raw, ei, ej))
            else:
                run += 1
                if max_rejected and run >= max_rejected:
                    n_stopped += 1
                    break

    # pass 2: profile coverage >= min_cov (cov-mode 2 = align-stage query
    # = the PROFILE); the E gate re-applies but the score is unchanged
    final = []
    for qi, pid, raw, ei, ej in pass1:
        si, sj = _sw_starts(res_list[qi], db.profile(pid), ei, ej)
        pcov = (ej - sj + 1) / float(db.lengths[pid])
        if pcov >= min_cov:
            final.append((qi, pid, raw))

    # swap back + best hit: E recomputed from the INT bitscore with
    # m = gene length, n = profile-DB positions; head of compareHits order
    best = {}
    for qi, pid, raw in final:
        bits = math.floor((lam * raw - math.log(kk)) / LN2 + 0.5)
        key = (-bits, int(db.lengths[pid]), pid)
        if qi not in best or key < best[qi][0]:
            best[qi] = (key, pid, bits)
    out = {}
    for qi, (_, pid, bits) in best.items():
        ev_rep = len(res_list[qi]) * db.total_positions * 2.0 ** (-bits)
        taxid = int(db.taxids[pid]) if db.taxids[pid] > 0 else 1
        out[qi] = (str(db.names[pid]), ev_rep, int(bits), taxid)
    return out, n_stopped


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------


def _make_db_and_queries():
    # > 256 profiles so the engine takes the production prefiltered path;
    # integral scores so f32 engine sums match the f64 oracle exactly
    db = ProfileDB.synthetic(
        seed=77, n_profiles=300, min_len=30, max_len=60, integral=True
    )
    rng = np.random.default_rng(5)
    res_list = []
    for qi in range(10):
        target = int(rng.integers(0, db.n_profiles))
        cons = db.consensus(target).astype(np.int8)
        kind = qi % 4
        if kind == 0:  # near-exact homolog
            seq = cons.copy()
        elif kind == 1:  # 20% mutated
            seq = cons.copy()
            pos = rng.choice(len(seq), max(1, len(seq) // 5), replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        elif kind == 2:  # fragment: covers only part of the PROFILE
            half = max(12, len(cons) // 2)
            seq = cons[:half].copy()
        else:  # background noise
            seq = rng.integers(0, N_AA, 50).astype(np.int8)
        res_list.append(seq)
    names = [f"g_{i}" for i in range(len(res_list))]
    seqs = ["".join(ALPHABET[r] for r in seq) for seq in res_list]
    return db, names, seqs, res_list


@pytest.mark.parametrize(
    "evalue_thr,min_cov,max_rejected",
    [
        (1e-3, 0.2, 280),  # production defaults
        (1e-3, 0.8, 280),  # strict profile coverage: fragments must drop
        (1e-12, 0.2, 1),  # harsh gate + stop-at-first-rejection
        (1e-3, 0.2, 0),  # stop rule disabled
    ],
)
def test_engine_matches_profile_query_oracle(evalue_thr, min_cov, max_rejected):
    db, names, seqs, res_list = _make_db_and_queries()
    want, _ = oracle_chain(db, res_list, evalue_thr, min_cov, max_rejected)
    got = protein_search.search(
        names,
        seqs,
        db,
        evalue_threshold=evalue_thr,
        min_cov=min_cov,
        max_rejected=max_rejected,
    )
    want_named = {names[qi]: v for qi, v in want.items()}
    assert got.keys() == want_named.keys()
    for q in want_named:
        wt, we, wb, wx = want_named[q]
        gt, ge, gb, gx = got[q]
        assert (gt, gb, gx) == (wt, wb, wx), f"{q}: {got[q]} != {want_named[q]}"
        np.testing.assert_allclose(ge, we, rtol=1e-12)


def test_stop_rule_actually_triggers_in_oracle():
    """The harsh configuration must exercise the per-profile stop rule —
    otherwise the max_rejected=1 case above proves nothing."""
    db, names, seqs, res_list = _make_db_and_queries()
    _, n_stopped = oracle_chain(db, res_list, 1e-12, 0.2, 1)
    assert n_stopped > 0


def test_profile_coverage_not_gene_coverage():
    """A short gene fragment aligns over its FULL length (gene coverage
    1.0) but covers only ~half the profile: the reference's cov-mode 2
    gates on the PROFILE side, so min_cov=0.8 must reject it while
    min_cov=0.2 accepts it. A gene-coverage implementation would accept
    both — this is the discriminating case for the round-4 orientation
    bug."""
    db = ProfileDB.synthetic(
        seed=3, n_profiles=300, min_len=40, max_len=50, integral=True
    )
    target = 123
    cons = db.consensus(target).astype(np.int8)
    frag = cons[: len(cons) // 2]
    seqs = ["".join(ALPHABET[r] for r in frag)]
    loose = protein_search.search(["g_1"], seqs, db, min_cov=0.2)
    assert loose and loose["g_1"][0] == str(db.names[target])
    strict = protein_search.search(["g_1"], seqs, db, min_cov=0.8)
    assert "g_1" not in strict


def test_gate_evalue_uses_profile_length_and_query_set_size():
    """The align-stage E-gate is m = PROFILE length x n = protein-set
    residues: adding an unrelated query to the set grows n for every pair
    and must flip a threshold-edge hit to a rejection — the gene-oriented
    gate (m = gene length, n = DB positions) is insensitive to the query
    set and would keep the hit."""
    db = ProfileDB.synthetic(
        seed=9, n_profiles=300, min_len=40, max_len=60, integral=True
    )
    target = 42
    cons = db.consensus(target).astype(np.int8)
    rng = np.random.default_rng(1)
    seq = cons.copy()
    pos = rng.choice(len(seq), len(seq) // 4, replace=False)
    seq[pos] = rng.integers(0, N_AA, len(pos))
    qseq = "".join(ALPHABET[r] for r in seq)
    solo = protein_search.search(["g_1"], [qseq], db, evalue_threshold=1e30)
    assert solo, "mutated consensus must hit at a permissive threshold"
    raw_bits = solo["g_1"][2]
    # reconstruct the gate E of the winning pair for the solo query set
    plen = int(db.lengths[target])
    lam, kk = KA_LAMBDA, KA_K
    # invert the int bitscore only approximately: recover raw from the
    # engine by sweeping the threshold instead — pick thr between the
    # solo-set gate E and the enlarged-set gate E
    raw = (raw_bits * LN2 + math.log(kk)) / lam  # within 0.5 bit of true
    ev_solo = kk * plen * len(seq) * math.exp(-lam * raw)
    # a wide margin (x8) absorbs the 0.5-bit rounding of the reconstruction
    thr = ev_solo * 8
    assert protein_search.search(["g_1"], [qseq], db, evalue_threshold=thr)
    noise = "".join(
        ALPHABET[r] for r in rng.integers(0, N_AA, len(seq) * 100)
    )
    both = protein_search.search(
        ["g_1", "g_2"], [qseq, noise], db, evalue_threshold=thr
    )
    # n grew ~101x, so the pair's gate E rose ~101x past thr -> rejected
    assert "g_1" not in both


def test_sharded_engine_matches_oracle():
    """Close the transitive-equality gap directly: the (data x db)-mesh
    production path must match the sequential profile-as-query oracle
    (not just the host path, which is tested against both separately)."""
    from genomad_tpu.parallel import mesh as meshlib

    db, names, seqs, res_list = _make_db_and_queries()
    want, _ = oracle_chain(db, res_list, 1e-3, 0.2, 280)
    mesh = meshlib.make_mesh(n_data=2, n_db=4)
    got = protein_search.search(names, seqs, db, mesh=mesh)
    want_named = {names[qi]: v for qi, v in want.items()}
    assert got.keys() == want_named.keys()
    for q in want_named:
        wt, we, wb, wx = want_named[q]
        gt, ge, gb, gx = got[q]
        assert (gt, gb, gx) == (wt, wb, wx), f"{q}: {got[q]} != {want_named[q]}"
        np.testing.assert_allclose(ge, we, rtol=1e-12)
