"""Device-side sharded dense search: mesh-sharded result must equal the
unsharded result on the virtual 8-device CPU mesh."""

import numpy as np

from genomad_tpu.ops.profiledb import N_AA, ProfileDB
from genomad_tpu.parallel import mesh as meshlib, sharded_search


def make_dense(db: ProfileDB, Lp: int):
    profiles = np.zeros((db.n_profiles, Lp, N_AA), np.float32)
    for i in range(db.n_profiles):
        prof = db.profile(i)[:Lp]
        profiles[i, : len(prof)] = prof
    return profiles


def test_dense_best_hits_unsharded_vs_sharded():
    db = ProfileDB.synthetic(seed=51, n_profiles=16, min_len=40, max_len=64)
    profiles = make_dense(db, 64)
    queries = np.full((8, 48), 20, np.int32)
    for qi, target in enumerate(range(0, 16, 2)):
        cons = db.consensus(target)[:48]
        queries[qi, : len(cons)] = cons
    best_unsharded, score_unsharded = sharded_search.dense_best_hits(queries, profiles)
    np.testing.assert_array_equal(best_unsharded, np.arange(0, 16, 2))

    for n_db in (2, 4):
        mesh = meshlib.make_mesh(n_data=8 // n_db, n_db=n_db)
        best, score = sharded_search.dense_best_hits(queries, profiles, mesh)
        np.testing.assert_array_equal(best, best_unsharded)
        np.testing.assert_allclose(score, score_unsharded, rtol=1e-5)


def _make_queries(db: ProfileDB, n_queries: int, seed: int):
    from genomad_tpu.ops.profiledb import ALPHABET

    rng = np.random.default_rng(seed)
    names, seqs = [], []
    for qi in range(n_queries):
        if qi % 3 < 2:
            target = int(rng.integers(0, db.n_profiles))
            seq = db.consensus(target).copy()
            pos = rng.choice(len(seq), max(1, len(seq) // 10), replace=False)
            seq[pos] = rng.integers(0, N_AA, len(pos))
        else:
            seq = rng.integers(0, N_AA, int(rng.integers(40, 120)))
        names.append(f"q_{qi}")
        seqs.append("".join(ALPHABET[r] for r in seq))
    return names, seqs


def assert_hits_equivalent(got: dict, want: dict):
    """Hit tables must agree on everything the pipeline consumes: same
    query set, same winning marker, same integer bitscore, same taxid.

    The float E-value is only *reported* (no downstream module reads it
    numerically — features consume SPM classes/counts); it may move by
    ~1e-5 relative because the raw f32 alignment score can differ by 1 ulp
    between differently-compiled XLA programs (constant reassociation /
    FMA contraction differ per program shape). The round-1 host shard loop
    had the same property: each shard count compiles a different program."""
    assert got.keys() == want.keys()
    for q in want:
        gt, ge, gb, gx = got[q]
        wt, we, wb, wx = want[q]
        assert (gt, gb, gx) == (wt, wb, wx), f"{q}: {got[q]} != {want[q]}"
        np.testing.assert_allclose(ge, we, rtol=1e-4)


def test_production_search_sharded_matches_host():
    """The production search with a mesh (ONE jitted DB-sharded program:
    profiles sharded over 'db', on-device gates + allreduce best-hit merge)
    must match the host single-device result for every db-axis size."""
    from genomad_tpu.ops import protein_search

    db = ProfileDB.synthetic(seed=7, n_profiles=300, min_len=40, max_len=180)
    names, seqs = _make_queries(db, 48, seed=3)

    reference = protein_search.search(names, seqs, db)
    assert reference, "expected at least one hit from planted queries"

    for n_db in (2, 8):
        mesh = meshlib.make_mesh(n_data=8 // n_db, n_db=n_db)
        got = protein_search.search(names, seqs, db, mesh=mesh)
        assert_hits_equivalent(got, reference)


def test_gate_threshold_edge_consistency():
    """E-value-marginal pairs pass or fail IDENTICALLY on the host and
    DB-sharded paths: both gate through the same on-device f32 _gate_ev.

    The threshold sweep pins the gate to each hit's own E-value (exactly
    at, just below, just above), so at least one sweep point sits within
    float32 rounding of the accept/reject boundary — the regime where the
    old f64-host/f32-device split produced path-dependent results."""
    from genomad_tpu.ops import protein_search

    db = ProfileDB.synthetic(seed=23, n_profiles=64, min_len=60, max_len=120)
    names, seqs = _make_queries(db, 8, seed=9)
    base = protein_search.search(names, seqs, db, evalue_threshold=1e3)
    assert base, "expected hits at a permissive threshold"
    mesh = meshlib.make_mesh(n_data=2, n_db=4)
    evs = sorted(ev for (_, ev, _, _) in base.values())
    for ev in evs[:2]:
        for thr in (ev * (1 - 1e-6), ev, ev * (1 + 1e-6)):
            host = protein_search.search(names, seqs, db, evalue_threshold=thr)
            shard = protein_search.search(
                names, seqs, db, mesh=mesh, evalue_threshold=thr
            )
            assert host.keys() == shard.keys(), f"thr={thr!r}"
            for q in host:
                assert host[q][0] == shard[q][0], f"thr={thr!r} {q}"
                assert host[q][2] == shard[q][2], f"thr={thr!r} {q}"


def test_shard_merge_compare_hits_tiebreak():
    """The best-hit/merge key is Matcher::compareHits after the swap back:
    int bitscore desc, then PROFILE LENGTH asc, then profile id asc — and
    search_sharded must apply the identical key across shards.

    Two profiles whose raw scores round to the same integer bitscore but
    whose lengths differ: the SHORTER profile must win even though the
    longer one has the higher raw score (the reference's reported E is a
    pure function of the int bitscore, so raw-score differences below the
    rounding step are invisible to its sort)."""
    from genomad_tpu.ops import protein_search
    from genomad_tpu.ops.profiledb import ALPHABET

    L = 40
    res = np.arange(L) % 20
    strong = np.full((L, N_AA), -5.0, np.float32)
    strong[np.arange(L), res] = 2.0  # raw 80.0, plen 40
    weak = np.full((L + 4, N_AA), -5.0, np.float32)
    weak[np.arange(L), res] = 2.0
    weak[0, res[0]] = 1.8  # raw 79.8 — same int bitscore, plen 44
    # id order puts the LONGER profile first: a key missing the plen
    # tie-break would pick it; ids land on different shards
    db = ProfileDB.from_profiles(["a_long_weak", "b_short_strong"], [weak, strong])
    names, seqs = ["q"], ["".join(ALPHABET[r] for r in res)]

    full = protein_search.search(names, seqs, db)
    assert full["q"][0] == "b_short_strong"
    # sanity: the rounding edge is real — both profiles alone give the
    # same integer bitscore
    lone_weak = protein_search.search(
        names, seqs, db.shard(2, 0), db_positions=db.total_positions
    )
    assert full["q"][2] == lone_weak["q"][2]

    sharded = protein_search.search_sharded(names, seqs, db, n_shards=2)
    assert sharded["q"] == full["q"]

    # equal bitscore AND equal length -> smaller profile id wins
    twin = ProfileDB.from_profiles(["p0", "p1"], [strong, strong.copy()])
    t_full = protein_search.search(names, seqs, twin)
    assert t_full["q"][0] == "p0"
    t_sharded = protein_search.search_sharded(names, seqs, twin, n_shards=2)
    assert t_sharded["q"] == t_full["q"]


def test_production_search_sharded_matches_host_loop():
    """The legacy host shard loop (search_sharded) and the device-sharded
    path implement the same merge semantics."""
    from genomad_tpu.ops import protein_search

    db = ProfileDB.synthetic(seed=11, n_profiles=120, min_len=40, max_len=100)
    names, seqs = _make_queries(db, 24, seed=5)

    host_loop = protein_search.search_sharded(names, seqs, db, n_shards=4)
    mesh = meshlib.make_mesh(n_data=2, n_db=4)
    device = protein_search.search(names, seqs, db, mesh=mesh)
    assert_hits_equivalent(device, host_loop)


def test_profile_major_on_mesh_matches_streaming(monkeypatch):
    """Profile-major scheduling over the (data x db) mesh (its stats_fn is
    the sharded all-in-one program, incl. the precomputed coverage column)
    must equal the streaming mesh path and the host path."""
    from genomad_tpu.ops import protein_search

    monkeypatch.setattr(protein_search, "_PM_ROUND", 8)
    db = ProfileDB.synthetic(seed=37, n_profiles=300, min_len=40, max_len=120)
    names, seqs = _make_queries(db, 24, seed=8)
    mesh = meshlib.make_mesh(n_data=2, n_db=4)
    stream = protein_search.search(names, seqs, db, mesh=mesh, profile_major=False)
    pmajor = protein_search.search(names, seqs, db, mesh=mesh, profile_major=True)
    assert stream == pmajor
    host = protein_search.search(names, seqs, db, profile_major=True)
    assert_hits_equivalent(pmajor, host)
