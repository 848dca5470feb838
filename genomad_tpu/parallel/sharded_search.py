"""Device-side DB-sharded dense search step.

The production search pipeline prefilters on the host and aligns candidate
pairs on device (ops.protein_search.search). For small databases (e.g. the
16-profile integrase DB) and for pod-scale dense scoring, this module
provides the all-pairs path with the profile axis sharded over the 'db'
mesh axis: every device scores the full query batch against its local
profile shard, and the best hit merges with an argmax allreduce — the
native replacement for MMseqs2 ``--splits`` serial chunking
(genomad/mmseqs2.py:83-95).

Determinism: ties break on the smaller global profile index, independent of
the shard count (SURVEY.md section 7.3 item 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from genomad_tpu.ops import protein_search


@functools.partial(jax.jit, static_argnames=())
def _score_all_pairs(queries: jnp.ndarray, profiles: jnp.ndarray) -> jnp.ndarray:
    """SW score of every query against every profile.

    queries: (Q, Lq) int32; profiles: (P, Lp, 21) f32 -> scores (Q, P).
    """

    def one_query(q):
        best, _, _ = protein_search._sw_forward(
            jnp.broadcast_to(q, (profiles.shape[0],) + q.shape), profiles
        )
        return best

    return jax.vmap(one_query)(queries)


def dense_best_hits(queries: np.ndarray, profiles: np.ndarray, mesh=None):
    """Best profile per query over a dense profile tensor.

    queries: (Q, Lq) int32 padded with 20; profiles: (P, Lp, 20) f32 padded
    with zero rows. With a mesh, profiles shard over 'db' and queries over
    'data'; XLA inserts the cross-shard collectives for the row argmax.

    Returns (best_profile (Q,), best_score (Q,)).
    """
    prof21 = np.concatenate(
        [profiles, np.zeros((*profiles.shape[:2], 1), np.float32)], axis=2
    ).astype(np.float32)
    queries = np.asarray(queries, np.int32)
    if mesh is not None:
        queries_dev = jax.device_put(queries, NamedSharding(mesh, P("data")))
        profiles_dev = jax.device_put(prof21, NamedSharding(mesh, P("db")))
    else:
        queries_dev = jnp.asarray(queries)
        profiles_dev = jnp.asarray(prof21)
    scores = _score_all_pairs(queries_dev, profiles_dev)
    # deterministic argmax: ties -> smaller profile index (jnp.argmax takes
    # the first maximal element, which is the smaller index)
    best_profile = jnp.argmax(scores, axis=1)
    best_score = jnp.max(scores, axis=1)
    return np.asarray(best_profile), np.asarray(best_score)
