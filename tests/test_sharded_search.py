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
