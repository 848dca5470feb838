"""TPU protein-vs-profile search engine.

Replaces the reference's 8-command MMseqs2 subprocess chain
(genomad/mmseqs2.py:53-196) with a two-stage native pipeline:

  1. **Prefilter** (host, vectorized numpy): query 5-mers are looked up in
     the DB's consensus-k-mer inverted index; per-(profile, diagonal) hits
     are scored by maximal ungapped diagonal extension (cumsum/cummin max-
     subarray, no scalar loops) and gated at ``min_ungapped_score`` (default
     25, the reference's ``--min-ungapped-score``; k=5 as ``-k 5``).
     Sensitivity (``-s``) follows MMseqs2's actual semantics: each query
     k-mer expands into its BLOSUM62 similar-k-mer list (ops.blosum), with
     the score threshold a linear function of ``-s``.

  2. **Alignment** (device, JAX): batched affine-gap local Smith-Waterman of
     query residues against profile PSSMs. The kernel is a lax.scan over
     query rows; the horizontal gap state is computed with a prefix-max
     (cummax) over target columns — valid because gap_open >= gap_extend
     makes close-then-reopen never optimal — so each row is pure vector
     work over (batch, target) with no sequential inner loop.
     A forward pass yields score + end cell; a reverse pass on accepted
     pairs yields the start cell, giving the alignment span on the profile
     axis for the reference's align-mode-2 coverage filter.

  3. **Gates + best hit — PROFILE-AS-QUERY orientation.** The reference
     swaps prefilter results before aligning (mmseqs2.py:97-106) and runs
     both align passes as ``mmseqs align <profileDB> <queryDB>``
     (mmseqs2.py:107-140): the marker PROFILE is the align-stage query and
     the gene is the target. Every align-stage gate therefore operates on
     the profile side, and this engine reproduces that orientation:

     - ``-e`` (pass 1+2): E = K * profile_length * n * exp(-lambda * S)
       with n = the total residue count of the protein query SET (MMseqs2
       builds the align evaluer from the target DB — here the swapped-in
       protein DB — so the search space is the protein set, not the
       profile DB).
     - ``--cov-mode 2 -c 0.2`` (pass 2): coverage of the align-stage QUERY
       = aligned profile span / profile length >= 0.2.
     - ``--max-rejected 280`` (pass 1 only; pass 2 runs the default
       INT_MAX): each PROFILE walks its candidate-GENE list (swapped
       prefilter order: ungapped score descending) and stops after 280
       consecutive E-value rejections. Applied post-hoc to batched
       results — bit-equal to the sequential walk because accept/reject
       is a pure per-pair function and the full per-profile lists are
       known once every query has been prefiltered.
     - **Best hit**: ``swapresults`` back (mmseqs2.py:141-150) re-derives
       the raw score from the INTEGER bitscore and recomputes the E-value
       in the gene orientation (E_report = gene_length * profile_db_positions
       * 2^-int_bits); ``filterdb --extract-lines 1`` (mmseqs2.py:151-158)
       then takes the head of each gene's list sorted by MMseqs2's
       Matcher::compareHits (E asc, then bitscore desc, then target length
       asc, then target key asc) — for a fixed gene that key reduces to
       (int bitscore desc, profile length asc, profile id asc).

Sharding: the profile DB shards across the 'db' mesh axis (the native
replacement for serial ``--splits`` chunking, mmseqs2.py:83-95) and the
candidate pair batch shards across BOTH the 'data' and 'db' axes; per-pair
stats return to the host, which applies the stop rule and merges best hits
deterministically (shard-count-invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomad_tpu import xla_cache  # noqa: F401  (persistent compile cache)

from genomad_tpu.ops import profiledb
from genomad_tpu.ops.profiledb import KMER_K, N_AA, ProfileDB, encode_kmers

# Gap costs (MMseqs2 defaults --gap-open 11 --gap-extend 1; a gap of length
# g costs open + (g-1) * extend).
GAP_OPEN = 11.0
GAP_EXTEND = 1.0

# Karlin-Altschul statistics (gapped BLOSUM62 regime).
KA_LAMBDA = 0.267
KA_K = 0.041
LN2 = float(np.log(2.0))


# ---------------------------------------------------------------------------
# Smith-Waterman kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def _sw_forward(queries: jnp.ndarray, profiles: jnp.ndarray):
    """Batched local SW of residue sequences against PSSMs.

    queries: (B, Lq) int32 residue indices (20 = pad/unknown, scores 0).
    profiles: (B, Lp, 21) float32 PSSMs (column 20 and padded rows are 0).

    Returns (best (B,), end_i (B,), end_j (B,)): best score and its cell
    (query row, target column), 0-indexed.
    """
    B, Lq = queries.shape
    Lp = profiles.shape[1]
    col = jnp.arange(Lp, dtype=jnp.float32)
    profiles_t = jnp.swapaxes(profiles, 1, 2)  # (B, 21, Lp)

    def row_step(carry, inp):
        h_prev, f_prev, best, best_i, best_j = carry
        q_i, i = inp
        s_row = jnp.take_along_axis(profiles_t, q_i[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
        f = jnp.maximum(h_prev - GAP_OPEN, f_prev - GAP_EXTEND)
        diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
        h0 = jnp.maximum(jnp.maximum(diag + s_row, f), 0.0)
        # horizontal gaps: E_j = max_{k<j}(h0_k - open + k*ext) - (j-1)*ext
        t = h0 - GAP_OPEN + GAP_EXTEND * col
        m = jax.lax.cummax(t, axis=1)
        m = jnp.pad(m[:, :-1], ((0, 0), (1, 0)), constant_values=-jnp.inf)
        e = m - GAP_EXTEND * (col - 1.0)
        h = jnp.maximum(h0, e)
        row_best = jnp.max(h, axis=1)
        row_arg = jnp.argmax(h, axis=1)
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        best_i = jnp.where(improved, i, best_i)
        best_j = jnp.where(improved, row_arg, best_j)
        return (h, f, best, best_i, best_j), None

    init = (
        jnp.zeros((B, Lp), jnp.float32),
        jnp.full((B, Lp), -jnp.inf, jnp.float32),
        jnp.zeros(B, jnp.float32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
    )
    rows = (jnp.swapaxes(queries, 0, 1), jnp.arange(Lq, dtype=jnp.int32))
    (h, f, best, best_i, best_j), _ = jax.lax.scan(row_step, init, rows)
    return best, best_i, best_j


def _sw_dispatch(queries: jnp.ndarray, prof21: jnp.ndarray):
    """Select the SW kernel: the Pallas kernel when enabled (TPU), else the
    lax.scan kernel. Both are numerically identical (tests/test_sw_pallas)."""
    import os

    if os.environ.get("GENOMAD_TPU_USE_PALLAS", "0") == "1":
        from genomad_tpu.ops import sw_pallas

        return sw_pallas.sw_forward_pallas(queries, prof21)
    return _sw_forward(queries, prof21)


def _pair_stats_ops(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """SW statistics for gathered (query, profile) operand batches.

    q: (N, Lq) int32; p: (N, Lp, 21) f32.
    Returns (N, 5) f32: score, end_i, end_j, start_i, start_j.
    """
    best, end_i, end_j = _sw_dispatch(q, p)
    # reverse the aligned prefixes in place on device: rev_q[b, t] =
    # q[b, end_i[b] - t] (pad 20 past the end), same for profile rows
    Lq, Lp = q.shape[1], p.shape[1]
    tq = end_i[:, None] - jnp.arange(Lq, dtype=jnp.int32)[None, :]
    rev_q = jnp.where(tq >= 0, jnp.take_along_axis(q, jnp.maximum(tq, 0), axis=1), 20)
    tp = end_j[:, None] - jnp.arange(Lp, dtype=jnp.int32)[None, :]
    rev_p = jnp.where(
        (tp >= 0)[:, :, None],
        jnp.take_along_axis(p, jnp.maximum(tp, 0)[:, :, None], axis=1),
        0.0,
    )
    _, rev_i, rev_j = _sw_dispatch(rev_q, rev_p)
    f32 = jnp.float32
    return jnp.stack(
        [
            best,
            end_i.astype(f32),
            end_j.astype(f32),
            (end_i - rev_i).astype(f32),
            (end_j - rev_j).astype(f32),
        ],
        axis=1,
    )


def ka_params(lam: float, kk: float, search_space: int) -> np.ndarray:
    """Traced Karlin-Altschul gate parameters: (lambda, log K in f32,
    search_space) as a (3,) f32 array. Traced — NOT static jit args — so
    one compiled SW program serves every database (a static size would
    recompile stage 2 per DB).

    ``search_space`` is the align-stage target-DB residue count. In the
    reference's swapped orientation the align target DB is the PROTEIN
    query set (mmseqs2.py:107-140), so pass the total query residue count
    — NOT the profile-DB positions (those enter only the swapped-back
    reported E-value)."""
    return np.array(
        [lam, np.log(np.float32(kk), dtype=np.float32), search_space],
        np.float32,
    )


@jax.jit
def _sw_fwd_gate(
    all_q: jnp.ndarray,
    all_p21: jnp.ndarray,
    p_lengths: jnp.ndarray,
    idx: jnp.ndarray,
    ka: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-only SW + E-value gate column for a batch of pairs.

    Operand assembly, the forward pass, and the f32 E-value column all
    happen on device so a pair batch costs exactly one host->device
    transfer (the (2, N) index array) and one device->host transfer (the
    (N, 4) result) — transfer round-trips, not compute, dominate when the
    device is reached through a network tunnel. The reverse (alignment
    start / coverage) pass runs separately (_sw_rev_cov) on E-value
    SURVIVORS only — MMseqs2's own pass-1(mode 1)/pass-2(mode 2) split
    (genomad/mmseqs2.py:107-140), which here halves SW compute because
    most candidate pairs fail the E-value gate.

    all_q: (nq, Lq) staged padded queries; all_p21: (np, Lp, 21) staged
    padded profiles (f32 or bf16 — converted in-program); p_lengths: (np,)
    f32 profile lengths (the align-stage QUERY lengths in the reference's
    swapped orientation); idx: (2, N) int32 rows into each; ka:
    ka_params() with the protein-set residue count as search space.
    Returns (N, 4) f32: score, end_i, end_j, evalue32 (from _gate_ev —
    identical to the sharded gate).
    """
    q = jnp.take(all_q, idx[0], axis=0)
    p = jnp.take(all_p21, idx[1], axis=0).astype(jnp.float32)
    best, end_i, end_j = _sw_dispatch(q, p)
    plen = jnp.take(p_lengths, idx[1]).astype(jnp.float32)
    ev = _gate_ev(best, plen, ka)
    return jnp.stack(
        [best, end_i.astype(jnp.float32), end_j.astype(jnp.float32), ev],
        axis=1,
    )


@jax.jit
def _sw_rev_cov(
    all_q: jnp.ndarray,
    all_p21: jnp.ndarray,
    p_lengths: jnp.ndarray,
    idx: jnp.ndarray,
    ends: jnp.ndarray,
) -> jnp.ndarray:
    """Reverse-pass PROFILE coverage for pairs that passed the E-value gate.

    idx: (2, M) rows into the staged operand caches; ends: (2, M) f32
    (end_i, end_j) from the forward pass. Returns (M,) f32 pcov32 =
    (end_j - start_j + 1) / plen with start_j from the reverse SW — the
    reference's ``--cov-mode 2 -c 0.2`` gates on coverage of the
    align-stage QUERY, which is the PROFILE in the swapped orientation
    (mmseqs2.py:123-140). Same f32 statistic as the sharded gate.
    """
    q = jnp.take(all_q, idx[0], axis=0)
    p = jnp.take(all_p21, idx[1], axis=0).astype(jnp.float32)
    Lq, Lp = q.shape[1], p.shape[1]
    end_i = ends[0].astype(jnp.int32)
    end_j = ends[1].astype(jnp.int32)
    tq = end_i[:, None] - jnp.arange(Lq, dtype=jnp.int32)[None, :]
    rev_q = jnp.where(tq >= 0, jnp.take_along_axis(q, jnp.maximum(tq, 0), axis=1), 20)
    tp = end_j[:, None] - jnp.arange(Lp, dtype=jnp.int32)[None, :]
    rev_p = jnp.where(
        (tp >= 0)[:, :, None],
        jnp.take_along_axis(p, jnp.maximum(tp, 0)[:, :, None], axis=1),
        0.0,
    )
    _, _, rev_j = _sw_dispatch(rev_q, rev_p)
    plen = jnp.take(p_lengths, idx[1]).astype(jnp.float32)
    return (rev_j.astype(jnp.float32) + 1.0) / plen


_INT32_MAX = np.iinfo(np.int32).max


def sw_align(queries: np.ndarray, profiles: np.ndarray, compute_starts: bool = False):
    """Forward (and optionally reverse) SW over a padded batch.

    queries: (B, Lq) int residue indices padded with 20.
    profiles: (B, Lp, 20) float PSSMs padded with zero rows.

    Returns dict with score, end_i, end_j (+ start_i, start_j when
    compute_starts): inclusive 0-indexed alignment boundaries.
    """
    queries = np.asarray(queries, np.int32)
    profiles = np.asarray(profiles, np.float32)
    # pad the batch axis to a power-of-two bucket: a data-dependent batch
    # size (e.g. the accept count of the E-value gate) would otherwise
    # trigger a fresh XLA compile for nearly every call
    n_real = queries.shape[0]
    n_pad = max(8, 1 << (n_real - 1).bit_length()) - n_real if n_real else 0
    if n_pad:
        queries = np.concatenate(
            [queries, np.full((n_pad, queries.shape[1]), 20, np.int32)]
        )
        profiles = np.concatenate(
            [profiles, np.zeros((n_pad, *profiles.shape[1:]), np.float32)]
        )
    prof21 = np.concatenate(
        [profiles, np.zeros((*profiles.shape[:2], 1), np.float32)], axis=2
    )
    best, end_i, end_j = (
        np.asarray(x)
        for x in _sw_dispatch(jnp.asarray(queries), jnp.asarray(prof21))
    )
    out = {"score": best[:n_real], "end_i": end_i[:n_real], "end_j": end_j[:n_real]}
    if compute_starts:
        # reverse pass stays at the padded batch size (same compiled program)
        B = queries.shape[0]
        rev_q = np.full_like(queries, 20)
        rev_p = np.zeros_like(prof21)
        for b in range(n_real):
            ie, je = end_i[b], end_j[b]
            rev_q[b, : ie + 1] = queries[b, : ie + 1][::-1]
            rev_p[b, : je + 1] = prof21[b, : je + 1][::-1]
        rbest, rei, rej = (
            np.asarray(x)[:n_real]
            for x in _sw_dispatch(jnp.asarray(rev_q), jnp.asarray(rev_p))
        )
        out["start_i"] = out["end_i"] - rei
        out["start_j"] = out["end_j"] - rej
        out["score_rev"] = rbest  # == score (sanity invariant)
    return out


def bitscore(raw_score, lam: float = KA_LAMBDA, k: float = KA_K) -> np.ndarray:
    return (lam * np.asarray(raw_score) - np.log(k)) / LN2


def _gate_ev(score, plen, ka):
    """float32 align-stage E-value — the SINGLE on-device gate
    implementation shared by the single-device and DB-sharded paths, so
    threshold-edge pairs pass or fail identically on both (they previously
    diverged: host gated in f64, device in f32).

    Computed in the reference's swapped orientation (profile as query,
    mmseqs2.py:107-140): E = K * plen * search_space * exp(-lambda * S)
    with search_space = the protein query set's residue count (ka[2]).

    score/plen: (N,) f32 traced; ka: ka_params() (3,) f32.
    """
    bits = (ka[0] * score - ka[1]) / LN2
    return plen * ka[2] * jnp.exp2(-bits)


def int_bitscore(raw_score, lam: float = KA_LAMBDA, k: float = KA_K) -> np.ndarray:
    """MMseqs2's stored integer bitscore: Matcher computes
    static_cast<int>(computeBitScore(score) + 0.5) — add-half then
    TRUNCATE TOWARD ZERO (trunc == floor for the positive scores that
    pass any real gate; they differ for negative bitscores reachable
    only under permissive test thresholds)."""
    return np.trunc(bitscore(raw_score, lam, k) + 0.5)


def evalue_from_bits(bits, query_length, db_positions) -> np.ndarray:
    """Reported (swapped-back) E-value. The reference's second swapresults
    re-derives the raw score from the INT bitscore and recomputes
    E = K * m * n * exp(-lambda * raw') with m = gene length and n = the
    profile DB's residue (consensus-position) count, which collapses to
    m * n * 2^-int_bits exactly (the K and lambda cancel)."""
    return query_length * db_positions * np.power(2.0, -np.asarray(bits, np.float64))


def evalue(
    raw_score, query_length, db_positions, lam: float = KA_LAMBDA, k: float = KA_K
) -> np.ndarray:
    return query_length * db_positions * np.power(2.0, -bitscore(raw_score, lam, k))


# ---------------------------------------------------------------------------
# Prefilter
# ---------------------------------------------------------------------------


_EMPTY_CANDS = (np.zeros(0, np.int32), np.zeros(0, np.float32))


def _max_subarray(scores: np.ndarray) -> np.ndarray:
    """Row-wise maximal subarray sum (ungapped diagonal score), vectorized:
    max_t(prefix_t - min(0, min_{k<t} prefix_k))."""
    prefix = np.cumsum(scores, axis=1)
    min_before = np.minimum(np.minimum.accumulate(prefix, axis=1), 0.0)
    shifted = np.concatenate(
        [np.zeros((scores.shape[0], 1)), min_before[:, :-1]], axis=1
    )
    return np.max(prefix - shifted, axis=1)


def prefilter_query(
    residues: np.ndarray,
    db: ProfileDB,
    index,
    min_ungapped_score: float = 25.0,
    max_candidates: int = 4000,
    kmer_thr: float | None = None,
    expansion_cache: dict | None = None,
    drops: list | None = None,
    bias: np.ndarray | None = None,
):
    """Candidate (profile ids, ungapped scores) for one query, sorted by
    score descending (profile id ascending on ties) — MMseqs2's prefilter
    result order, which stage 2 relies on for --max-rejected semantics.

    Pipeline: query k-mers [-> similar-k-mer expansion] -> inverted-index
    ranges -> (profile, diagonal) hits -> ungapped diagonal max-subarray
    score -> gate.

    ``kmer_thr``: BLOSUM62 score threshold for query-side similar-k-mer
    expansion (MMseqs2 ``-s`` semantics, see ops.blosum); None = exact
    k-mers only. ``expansion_cache``: shared {(code, bias sum): similar
    codes} memo across queries of one search. ``drops``: when given, the
    number of candidates dropped over ``max_candidates`` is appended (the
    caller logs it — truncation is never silent). ``bias``: per-position
    integer composition-bias corrections (blosum.comp_bias — MMseqs2's
    default --comp-bias-corr 1): added to the diagonal scores and, summed
    over each k-mer window (clamped at blosum.COMP_BIAS_SLACK), subtracted
    from the expansion threshold.
    """
    codes = encode_kmers(residues)
    qpos_all = np.arange(len(codes), dtype=np.int64)
    valid = codes >= 0
    codes, qpos_all = codes[valid], qpos_all[valid]
    if kmer_thr is not None and len(codes):
        from genomad_tpu.ops import blosum

        if bias is not None:
            kb_win = np.convolve(bias, np.ones(KMER_K, np.int64), "valid")
            kb_win = np.minimum(kb_win, int(blosum.COMP_BIAS_SLACK))
        cache = expansion_cache if expansion_cache is not None else {}
        exp_codes, exp_qpos = [], []
        windows = np.lib.stride_tricks.sliding_window_view(residues, KMER_K)
        for code, q in zip(codes, qpos_all):
            kb = int(kb_win[q]) if bias is not None else 0
            key = (int(code), kb)
            sim = cache.get(key)
            if sim is None:
                sim = blosum.similar_kmers(windows[q], kmer_thr - kb)[0]
                cache[key] = sim
            exp_codes.append(sim)
            exp_qpos.append(np.full(len(sim), q, np.int64))
        codes = np.concatenate(exp_codes) if exp_codes else codes
        qpos_all = np.concatenate(exp_qpos) if exp_qpos else qpos_all
    if not len(codes):
        return _EMPTY_CANDS
    starts, ends = index.lookup(codes)
    counts = ends - starts
    total = int(counts.sum())
    if total == 0:
        return _EMPTY_CANDS
    # expand [starts, ends) ranges into flat entry indices
    entry_idx = np.repeat(starts - np.concatenate([[0], np.cumsum(counts)[:-1]]), counts) + np.arange(total)
    hit_qpos = np.repeat(qpos_all, counts)
    hit_profile = index.profiles[entry_idx]
    hit_ppos = index.positions[entry_idx].astype(np.int64)
    Lq = len(residues)
    diag = hit_ppos - hit_qpos + Lq  # >= 1
    # unique (profile, diagonal) candidates
    max_diag = Lq + int(db.lengths.max()) + 1
    keys = hit_profile.astype(np.int64) * max_diag + diag
    uniq_keys, key_counts = np.unique(keys, return_counts=True)
    if kmer_thr is not None:
        # double-k-mer-match criterion (MMseqs2): in expansion mode a
        # diagonal needs >= 2 hits before it is extended — similar-k-mer
        # lists generate single-hit noise diagonals in bulk
        keep2 = key_counts >= 2
        uniq_keys, key_counts = uniq_keys[keep2], key_counts[keep2]
    cand_profile = (uniq_keys // max_diag).astype(np.int32)
    cand_diag = (uniq_keys % max_diag).astype(np.int64) - Lq
    if len(uniq_keys) > max_candidates * 4:
        # keep diagonals with the most k-mer hits to bound the gather below
        top = np.argsort(key_counts)[::-1][: max_candidates * 4]
        cand_profile, cand_diag = cand_profile[np.sort(top)], cand_diag[np.sort(top)]
    # ungapped extension along each candidate diagonal
    p_len = db.lengths[cand_profile].astype(np.int64)
    q_start = np.maximum(0, -cand_diag)
    p_start = np.maximum(0, cand_diag)
    overlap = np.minimum(Lq - q_start, p_len - p_start)
    C = len(cand_profile)
    if C == 0:
        return _EMPTY_CANDS
    t = np.arange(Lq, dtype=np.int64)[None, :]
    qi = q_start[:, None] + t  # (C, Lq)
    pi = p_start[:, None] + t
    in_range = t < overlap[:, None]
    qi_c = np.minimum(qi, Lq - 1)
    pi_c = np.minimum(pi, p_len[:, None] - 1)
    flat_rows = db.offsets[cand_profile][:, None] + pi_c
    res = residues[qi_c].astype(np.int64)
    cell = db.pssm[flat_rows, np.where(res < N_AA, res, 0)]
    if bias is not None:
        cell = cell + bias[qi_c]
    scores = np.where(in_range & (res < N_AA), cell, 0.0)
    ungapped = _max_subarray(scores)
    ok = ungapped >= min_ungapped_score
    prof_ok, score_ok = cand_profile[ok], ungapped[ok].astype(np.float32)
    if not len(prof_ok):
        return _EMPTY_CANDS
    # per-profile best score over its qualifying diagonals
    uniq, inv = np.unique(prof_ok, return_inverse=True)
    best = np.full(len(uniq), -np.inf, np.float32)
    np.maximum.at(best, inv, score_ok)
    order = np.lexsort((uniq, -best))
    sel_ids, sel_scores = uniq[order].astype(np.int32), best[order]
    if len(sel_ids) > max_candidates:
        # keep the best-scoring profiles; the excess is reported via
        # ``drops`` (and logged by the caller), never silently discarded
        if drops is not None:
            drops.append(len(sel_ids) - max_candidates)
        sel_ids, sel_scores = sel_ids[:max_candidates], sel_scores[:max_candidates]
    return sel_ids, sel_scores


# ---------------------------------------------------------------------------
# Search orchestration
# ---------------------------------------------------------------------------


# Length-bucket upper bounds shared by the padded operand caches: every
# staged dimension is padded to one of these so the compiled program set is
# small, stable across runs, and served by the persistent compilation cache.
# Round 5 added the 384 and 768 bounds: stage 2 now aligns the full
# reference-mandated pair set (profile-as-query semantics), making SW
# padding waste a first-order cost — proteins/profiles cluster in the
# 250-400-residue range, where a 512 bound wastes ~2.5x of the scan cells
# (measured: the (512, 512) bucket carried 37% of all pairs at 20k-DB
# scale). Each extra bucket costs one-time compiles served by the
# persistent cache afterwards.
_BOUNDS = (128, 256, 384, 512, 768, 1024, 4096, 32768)


def _bucket_bound(lengths):
    b = np.searchsorted(np.asarray(_BOUNDS), lengths, side="left")
    if np.any(b >= len(_BOUNDS)):
        too_long = int(np.max(np.asarray(lengths)))
        raise ValueError(
            f"sequence/profile length {too_long} exceeds the maximum "
            f"supported operand length {_BOUNDS[-1]}"
        )
    return b


def _pow2(n: int, floor: int = 128) -> int:
    return max(floor, 1 << (max(n, 1) - 1).bit_length())


def _count_pad(n: int) -> int:
    """Pad a profile count to a multiple of 4096 (pow2 below that): at
    227k-profile scale, power-of-two padding of ~90k-profile buckets wastes
    ~50% of staged HBM; multiples of 4096 keep the compiled-shape set just
    as stable for a given database while bounding waste to <5%."""
    return _pow2(n) if n <= 4096 else -(-n // 4096) * 4096


def _staging_source(db) -> np.ndarray:
    """Row source for device-bucket assembly: the int8 PSSM copy when the
    scores are integral (numerically identical after the bucket's dtype
    conversion, and it spares materializing the lazy multi-GB f32 PSSM on
    the production cold path), else the f32 matrix."""
    p8 = db.pssm_i8
    return p8 if p8 is not None else db.pssm


def _staging_dtype(db):
    """Device staging dtype for profile tensors: bf16 only for LARGE
    databases whose scores bf16 represents exactly (integral, |v| <= 127
    — db.pssm_i8 is not None); otherwise f32 so float PSSMs are never
    silently quantized (gating on profile count alone previously let a
    large float-scored DB lose mantissa bits and flip threshold-edge
    accept decisions vs the f32 host reference)."""
    if db.n_profiles > 4096 and db.pssm_i8 is not None:
        return jnp.bfloat16
    if db.n_profiles > 4096:
        import warnings

        warnings.warn(
            "large profile DB has non-integral PSSM scores: staging in "
            "f32 (exact) — expect ~4x the HBM of an integral-score DB"
        )
    return np.float32


def _staging_lock(db):
    """ONE lock per DB for all bucket builds (not per-bucket): a bucket
    assembly transiently holds a ~GB-scale host array plus the in-flight
    device copy, and the prestage thread racing the main thread on
    DIFFERENT buckets doubled that peak — with deferred buffer deletion
    through the axon tunnel that intermittently exhausted HBM at 227k
    scale. Serializing builds caps the transient at one bucket while
    keeping the staging/prefilter overlap."""
    import threading

    return db.__dict__.setdefault("_staging_build_lock", threading.Lock())


def _assemble_bucket(db, ids, Lp, n_rows):
    """Host-side assembly shared by the single-device and sharded staging
    paths: the (n_rows, Lp, 21) padded profile tensor (staging dtype; row
    i holds profile ids[i], padding rows zero) and the per-row profile
    lengths (pad rows 1 to keep the E-value division finite; their
    zero-PSSM scores fail every gate)."""
    lens = db.lengths[ids].astype(np.int64)
    rows = db.offsets[ids][:, None] + np.arange(Lp)[None, :]
    mask = np.arange(Lp)[None, :] < lens[:, None]
    arr = np.zeros((n_rows, Lp, N_AA + 1), _staging_dtype(db))
    arr[: len(ids), :, :N_AA] = np.where(
        mask[:, :, None],
        _staging_source(db)[np.minimum(rows, db.offsets[-1] - 1)],
        0,
    )
    plen = np.ones(n_rows, np.float32)
    plen[: len(ids)] = lens
    return arr, plen


def _build_staged_bucket(db, pb_i):
    """Assemble + upload one profile length-class bucket (see
    get_staged_profiles inside search() for the caching/locking layer).
    Returns (sorted profile ids, device (count, Lp, 21) tensor, device
    per-row profile lengths)."""
    ids = np.where(_bucket_bound(db.lengths) == pb_i)[0]
    arr, plen = _assemble_bucket(db, ids, _BOUNDS[pb_i], _count_pad(len(ids)))
    return ids, jnp.asarray(arr), jnp.asarray(plen)


def search(
    query_names,
    query_seqs,
    db: ProfileDB,
    sensitivity: float = 4.2,
    evalue_threshold: float = 1e-3,
    min_cov: float = 0.2,
    min_ungapped_score: float = 25.0,
    skip_prefilter: bool = False,
    batch_size: int = 128,
    mesh=None,
    db_positions: int | None = None,
    max_seqs: int = 10_000_000,
    max_rejected: int = 280,
    n_threads: int | None = None,
    comp_bias_corr: bool = True,
    profile_major: bool | None = None,
    _details: bool = False,
) -> dict:
    """Full search: prefilter -> batched SW -> profile-side gates -> best hit.

    comp_bias_corr applies MMseqs2's default local composition-bias
    correction (--comp-bias-corr 1, inherited silently by the reference —
    see blosum.comp_bias) to the prefilter's k-mer expansion and diagonal
    scores. The align stage is uncorrected (its query is a profile).

    profile_major selects the large-input scheduling mode (None = auto:
    on when the query count reaches GENOMAD_PROFILE_MAJOR_MIN, default
    8192 — around that size the streaming pair table nears ~2-3 GB of
    host RAM at 227k-DB candidate rates, and per-profile gene lists
    approach the 280-rejection stop threshold where profile-major's
    early stopping starts paying for the lost prefilter overlap). The streaming mode overlaps the host prefilter with device
    alignment of ALL candidate pairs and applies the per-profile stop
    rule post-hoc — ideal when per-profile gene lists are short (the
    stop rule cannot fire, so nothing is wasted). At metagenome scale
    the lists grow long enough for the reference's stop rule to fire
    constantly; profile-major mode then prefilters everything first and
    aligns in the reference's own order — per-PROFILE, prefilter-score
    descending, stopping each profile's walk at the 280th consecutive
    rejection — cutting both alignment work and the O(pairs) result
    accumulation by the stop rule's savings. Both modes are bit-equal to
    the reference's sequential walk (and to each other — tested).

    Returns {query_name: (target, evalue, bitscore, taxid)} — the contract
    of MMseqs2.get_matches() (genomad/mmseqs2.py:198-212).

    sensitivity maps to the query-side similar-k-mer score threshold
    (blosum.kmer_score_threshold): higher ``-s`` lowers the bar and grows
    the per-position k-mer lists, exactly MMseqs2's ``-s`` mechanism (the
    integrase search runs at 8.2 — reference cli.py:592-599).

    n_threads: host prefilter worker count (the reference's MMseqs2
    ``--threads`` analog, genomad/mmseqs2.py:83); None = all available.

    GATE ORIENTATION (see the module docstring): the reference aligns with
    the PROFILE as query (mmseqs2.py:107-140), so:

    - ``evalue_threshold`` gates E = K * profile_len * total_query_residues
      * exp(-lambda * S) — profile-side m, protein-set search space;
    - ``min_cov`` is the reference's ``--cov-mode 2 -c 0.2``: minimum
      aligned-profile-span / profile-length (NOT gene coverage);
    - ``max_rejected`` (``--max-rejected 280``, pass 1 only) walks each
      PROFILE's candidate-gene list in swapped prefilter order (ungapped
      score desc, gene index asc on ties) and stops at the 280th
      consecutive E-value rejection. Because full per-profile lists exist
      only after every gene is prefiltered, the rule is applied post-hoc
      to the complete batched pair table — bit-equal to the sequential
      walk (accept/reject is a pure per-pair function); the "saved"
      alignments are simply computed and discarded, overlapped with the
      host prefilter. 0 disables the rule (align every candidate).
    - best hit per gene = (int bitscore desc, profile length asc, profile
      id asc) — the head of the swapped-back compareHits-sorted list; the
      reported E-value is gene_len * db_positions * 2^-int_bits, the
      swap-back recomputation.

    With a mesh, stage 2 runs as ONE jitted (data x db)-sharded program
    per operand bucket: profiles shard over 'db', the pair batch shards
    over both axes — see _sharded_pair_stats_program. Best-hit selection
    merges on the host; results are shard-count-invariant (the E-gate's
    search space is the query set, identical at any shard count).
    """
    residues_list = [profiledb.encode_protein(s) for s in query_seqs]
    # Karlin-Altschul parameters: the DB's calibrated fit when present
    # (ops.statistics.calibrate_db), else the generic BLOSUM62 constants.
    lam = db.ka_lambda if getattr(db, "ka_lambda", None) else KA_LAMBDA
    kk = db.ka_k if getattr(db, "ka_k", None) else KA_K
    # db_positions: the profile-DB residue count entering only the REPORTED
    # (swapped-back) E-value. Shard searches must pass the FULL database
    # size so reported E-values are shard-count-invariant, exactly as
    # MMseqs2 corrects split-mode E-values to the whole target DB
    # (mmseqs2.py:83-95). The align-stage GATE E-value instead uses the
    # protein query set's residue count (n_gate below), which no sharding
    # touches.
    if db_positions is None:
        db_positions = max(db.total_positions, 1)

    # ---- stage 1: candidate lists ----
    # Small DBs skip the prefilter entirely: batched device SW against a few
    # hundred profiles costs less than host k-mer expansion (this covers the
    # integrase DB, whose s=8.2 would otherwise build ~10^4-entry similar
    # k-mer lists per query position). In this all-pairs mode there is no
    # prefilter-score order, so --max-rejected (whose per-profile walk
    # order is the swapped prefilter order) is disabled — every pair is
    # aligned, a SUPERSET of the reference's behavior: with many query
    # genes a profile's list could exceed 280 consecutive rejections, and
    # the reference would then skip (possibly-accepting) genes past the
    # stop point while this path still aligns them (divergence documented
    # in PARITY.md; affects only the small-DB/integrase path).
    nq = len(residues_list)
    q_lengths = np.array([len(r) for r in residues_list], np.int64)
    # Align-stage search space: the reference's align evaluer is built from
    # the (swapped-in) target DB = the createdb'd protein set, whose
    # residue count covers EVERY input protein (mmseqs2.py:75,107-140).
    n_gate = max(int(q_lengths.sum()), 1)
    # max_seqs: candidates per query are capped to the top-``max_seqs``
    # by ungapped prefilter score — MMseqs2's --max-seqs. The reference
    # passes ``--max-seqs 10000000`` (effectively uncapped,
    # genomad/mmseqs2.py:90-91), which is this function's default; any
    # overflow past the cap is logged, never silent.
    # a query can select at most n_profiles candidates, so the output
    # buffer bound never needs to exceed it — with the reference's
    # 10M default the cap is therefore never hit (zero drops)
    out_bound = min(int(max_seqs), db.n_profiles)
    all_pairs = skip_prefilter or db.n_profiles <= 256
    if all_pairs:
        max_rejected = 0
        kmer_thr = None
        index = None
        bias_list = None
    else:
        from genomad_tpu.ops import blosum

        kmer_thr = blosum.kmer_score_threshold(sensitivity)
        index = db.kmer_index(1)  # consensus k-mers; sensitivity is query-side
        bias_list = (
            [blosum.comp_bias(r) for r in residues_list]
            if comp_bias_corr
            else None
        )

    drop_total = [0]

    def prefilter_group(q_idx):
        """Per-query (candidate ids, ungapped scores) for one group of
        query indices (host CPU). Scores feed the per-PROFILE
        --max-rejected walk order (swapped prefilter order)."""
        if all_pairs:
            ids = np.arange(db.n_profiles, dtype=np.int64)
            return [(ids, np.zeros(db.n_profiles, np.float32))] * len(q_idx)
        from genomad_tpu import native

        res_sub = [residues_list[i] for i in q_idx]
        bias_sub = [bias_list[i] for i in q_idx] if bias_list is not None else None
        result = native.native_prefilter_batch(
            index, res_sub, db, min_ungapped_score,
            kmer_thr=kmer_thr, max_out_per_query=out_bound,
            n_threads=n_threads, bias_list=bias_sub,
        )
        if result is None:  # no C++ toolchain: numpy fallback
            cache: dict = {}
            drop_list: list = []
            out_list = []
            for i in q_idx:
                ids, scores = prefilter_query(
                    residues_list[i], db, index, min_ungapped_score,
                    max_candidates=out_bound, kmer_thr=kmer_thr,
                    expansion_cache=cache, drops=drop_list,
                    bias=None if bias_list is None else bias_list[i],
                )
                out_list.append((ids.astype(np.int64), scores.astype(np.float32)))
            drop_total[0] += sum(drop_list)
            return out_list
        ids_list, scores_list, n_dropped = result
        drop_total[0] += n_dropped
        return [
            (ids.astype(np.int64), scores.astype(np.float32))
            for ids, scores in zip(ids_list, scores_list)
        ]

    # ---- staged operand caches (shared by both stage-2 backends) ----
    # Every staged array dimension is padded to a power of two so the
    # compiled program set is small, stable across runs, and served by the
    # persistent compilation cache — a data-dependent dimension (candidate
    # count, query count) would recompile the SW program on nearly every
    # call.
    padded_queries: dict[int, tuple] = {}

    def get_padded_queries(qb_i):
        if qb_i not in padded_queries:
            Lq = _BOUNDS[qb_i]
            arr = np.full((_pow2(len(residues_list)), Lq), 20, np.int32)
            for i, r in enumerate(residues_list):
                if len(r) <= Lq:
                    arr[i, : len(r)] = r
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from genomad_tpu.parallel.mesh import put_global

                padded_queries[qb_i] = put_global(arr, NamedSharding(mesh, P()))
            else:
                padded_queries[qb_i] = jnp.asarray(arr)
        return padded_queries[qb_i]

    def get_staged_profiles(pb_i):
        """Device-resident padded tensor of ALL profiles in this length
        class (ids sorted; lookups via searchsorted remap), with the 21st
        pad/unknown column appended. Cached on the DB object: the profile
        database uploads to HBM once per process, not once per search —
        this is the device-resident replacement for MMseqs2's target-DB
        memory-mapping (genomad/mmseqs2.py:83-95). Thread-safe — ONE
        staging lock per DB serializes builders (see _staging_lock: the
        transient build peak must stay one bucket), with an unlocked
        cache-hit fast path; the cold-start path stages buckets from a
        background thread OVERLAPPED with the host prefilter
        (see _prestage below).

        Large databases stage in bfloat16 ONLY when the PSSM is integral
        (db.pssm_i8 is not None): real geNomad/MMseqs2 profile scores are
        small integers, which bf16 represents exactly, and f32 staging of
        a 227k-profile DB would need ~9 GB of HBM + minutes of
        host->device transfer. Small DBs — and any DB with non-integral
        float scores, which bf16 would silently quantize to an 8-bit
        mantissa and flip threshold-edge gate decisions — keep f32."""
        cache = db.__dict__.setdefault("_device_buckets", {})
        if pb_i in cache:
            return cache[pb_i]
        with _staging_lock(db):
            if pb_i not in cache:
                cache[pb_i] = _build_staged_bucket(db, pb_i)
        return cache[pb_i]

    def get_staged_shards(pb_i):
        """(ids, per-device row count, profile tensor sharded over 'db',
        profile lengths sharded over 'db') for one profile length class.
        Rows [d * p_loc, (d+1) * p_loc) live on db-shard d (replicated over
        'data'); padding rows have zero PSSMs and length 1. Same locking
        discipline as get_staged_profiles (unlocked cache hit, per-DB
        build lock)."""
        n_db = mesh.shape.get("db", 1)
        cache = db.__dict__.setdefault("_device_bucket_shards", {})
        key = (pb_i, n_db)
        if key in cache:
            return cache[key]
        with _staging_lock(db):
            if key not in cache:
                cache[key] = _build_shard_bucket(key)
        return cache[key]

    def _build_shard_bucket(key):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from genomad_tpu.parallel.mesh import put_global

        pb_i, n_db = key
        ids = np.where(_bucket_bound(db.lengths) == pb_i)[0]
        per_shard = -(-len(ids) // n_db)
        p_loc = _pow2(per_shard, floor=8) if per_shard <= 4096 else _count_pad(per_shard)
        arr, plen = _assemble_bucket(db, ids, _BOUNDS[pb_i], n_db * p_loc)
        sh = NamedSharding(mesh, P("db"))
        return (ids, p_loc, put_global(arr, sh), put_global(plen, sh))

    ka = ka_params(float(lam), float(kk), n_gate)
    sharded = mesh is not None and (
        mesh.shape.get("db", 1) > 1 or mesh.shape.get("data", 1) > 1
    )
    if sharded:
        full_stats_fn = functools.partial(
            _pair_stats_sharded,
            db=db,
            q_lengths=q_lengths,
            mesh=mesh,
            get_padded_queries=get_padded_queries,
            get_staged_shards=get_staged_shards,
            ka=ka,
        )
    else:
        fwd_fn = functools.partial(
            _pair_fwd_host,
            db=db,
            q_lengths=q_lengths,
            get_padded_queries=get_padded_queries,
            get_staged_profiles=get_staged_profiles,
            ka=ka,
        )
        cov_fn = functools.partial(
            _pair_cov_host,
            db=db,
            q_lengths=q_lengths,
            get_padded_queries=get_padded_queries,
            get_staged_profiles=get_staged_profiles,
        )

    # ---- stage 2: batched forward SW over every candidate pair ----
    # Pass-1/pass-2 MMseqs2 semantics (genomad/mmseqs2.py:107-140): the
    # E-value gate is align-mode 1, the profile-coverage gate is
    # align-mode 2, and --max-rejected walks each PROFILE's gene list
    # (swapped orientation — see the docstring). The per-profile lists are
    # complete only after every gene has been prefiltered, so stage 2
    # simply aligns ALL candidate pairs (forward pass + E column),
    # accumulating per-pair records; the stop rule, the reverse/coverage
    # pass on survivors, and best-hit selection run once at the end
    # (_finalize). The "extra" alignments past the reference's stop points
    # are overlapped with the host prefilter, which dominates wall-clock.
    rec_q: list = []  # gene index per pair
    rec_p: list = []  # profile id per pair
    rec_pf: list = []  # prefilter ungapped score per pair
    rec_stats: list = []  # host: (N,4) score/end_i/end_j/ev32; sharded: (N,7)

    def run_stage2(q_idx, cand_group):
        sq, sp, spf = [], [], []
        for li, qi in enumerate(q_idx):
            ids, scores = cand_group[li]
            if not len(ids):
                continue
            sq.append(np.full(len(ids), qi, np.int64))
            sp.append(ids)
            spf.append(scores)
        if not sq:
            return
        pairs_q = np.concatenate(sq)
        pairs_p = np.concatenate(sp)
        if sharded:
            stats = full_stats_fn(pairs_q, pairs_p)
        else:
            stats = fwd_fn(pairs_q, pairs_p)
        # accumulate lean (i32/f32) records: the full pair table lives in
        # host RAM until finalize, ~28-44 B/pair
        rec_q.append(pairs_q.astype(np.int32))
        rec_p.append(pairs_p.astype(np.int32))
        rec_pf.append(np.concatenate(spf))
        rec_stats.append(stats)

    # ---- cold-start overlap: stage every profile bucket in a background
    # thread while the host prefilter chews on the first query groups.
    # Bucket assembly + tunnel upload is the dominant un-cacheable cold
    # cost at 227k scale (~60-90 s); lazily staging it inside the first
    # alignment call serialized it AFTER the first prefilter group. The
    # staging helpers are idempotent and share ONE per-DB build lock
    # (_staging_lock — the transient peak stays one bucket), so the main
    # path simply waits on whichever bucket it needs first.
    if not all_pairs and db.n_profiles > 4096 and jax.process_count() == 1:
        # (single-process only: on a pod, a background thread issuing
        # put_global concurrently with the main thread could order
        # cross-process array creations differently per process)
        import threading

        classes = np.unique(_bucket_bound(db.lengths)).tolist()

        def _prestage():
            try:
                for pb_i in classes:
                    if search_done[0]:
                        return  # the search finished; stop staging
                    if sharded:
                        get_staged_shards(int(pb_i))
                    else:
                        get_staged_profiles(int(pb_i))
            except Exception:  # pragma: no cover — the main path will
                pass  # rebuild (or raise) with proper context

        # non-daemon: a daemon thread killed mid-device_put at process
        # exit can wedge the single-client TPU server-side lock (axon);
        # the interpreter instead joins this thread, letting in-flight
        # uploads complete (they are bounded by one bucket's size)
        threading.Thread(target=_prestage, daemon=False).start()

    # ---- pipeline: the host prefilter of group k+1 overlaps the device
    # alignment of group k (the C++ batch call releases the GIL; stage 2
    # mostly waits on device round-trips). This replaces the reference's
    # sequential prefilter -> align subprocess chain with a two-stage
    # host/device pipeline.
    group_size = max(64, int(batch_size))
    groups = [
        np.arange(s, min(s + group_size, nq), dtype=np.int64)
        for s in range(0, nq, group_size)
    ]
    # checked by the prestage thread between bucket builds: a search that
    # finishes (or returns early) stops background staging after the
    # in-flight bucket instead of staging the whole DB for nothing
    search_done = [False]
    if profile_major is None:
        import os

        profile_major = not all_pairs and nq >= int(
            os.environ.get("GENOMAD_PROFILE_MAJOR_MIN", "8192")
        )
    if profile_major and not all_pairs:
        try:
            return _run_profile_major(
            groups,
            prefilter_group,
            full_stats_fn if sharded else fwd_fn,
            None if sharded else cov_fn,
            sharded=sharded,
            nq=nq,
            db=db,
            q_lengths=q_lengths,
            evalue_threshold=evalue_threshold,
            min_cov=min_cov,
            max_rejected=max_rejected,
            db_positions=db_positions,
            lam=lam,
            kk=kk,
            query_names=query_names,
            drop_total=drop_total,
                out_bound=out_bound,
                _details=_details,
            )
        finally:
            search_done[0] = True
    if len(groups) <= 1 or all_pairs:
        for g in groups:
            run_stage2(g, prefilter_group(g))
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(prefilter_group, groups[0])
            for gi, g in enumerate(groups):
                cand_group = fut.result()
                if gi + 1 < len(groups):
                    fut = ex.submit(prefilter_group, groups[gi + 1])
                run_stage2(g, cand_group)
    if drop_total[0]:
        import warnings

        warnings.warn(
            f"prefilter: kept the top {out_bound} candidates per query "
            f"by ungapped score (--max-seqs semantics); {drop_total[0]} "
            "weaker candidates dropped across the batch"
        )

    # ---- finalize: stop rule -> coverage pass -> best hit ----
    search_done[0] = True  # stops further background staging
    if not rec_q:
        return {}
    genes = np.concatenate(rec_q)
    profs = np.concatenate(rec_p)
    pf = np.concatenate(rec_pf)
    stats = np.concatenate(rec_stats, axis=0)
    raw = stats[:, 0]
    ev32 = stats[:, 5] if sharded else stats[:, 3]
    keep1 = ev32 <= np.float32(evalue_threshold)
    if max_rejected:
        # per-PROFILE sequential walk in swapped prefilter order: ungapped
        # score desc, gene index asc on ties (the reference's swapresults
        # sorts each profile's gene list by prefilter score; the tie order
        # is our deterministic choice — documented in PARITY.md)
        order = np.lexsort((genes, -pf, profs))
        aligned_o, _, _ = _max_rejected_mask(
            profs[order], keep1[order],
            np.zeros(db.n_profiles, np.int64), int(max_rejected),
        )
        aligned = np.empty(len(genes), bool)
        aligned[order] = aligned_o
    else:
        aligned = np.ones(len(genes), bool)
    need_cov = aligned & keep1
    if sharded:
        pcov = stats[:, 6]
    else:
        pcov = np.zeros(len(genes), np.float32)
        if np.any(need_cov):
            pcov[need_cov] = cov_fn(
                genes[need_cov], profs[need_cov], stats[need_cov, 1:3]
            )
    acc = need_cov & (pcov >= np.float32(min_cov))
    if not np.any(acc):
        return {}
    return _select_best_hits(
        genes[acc], profs[acc], raw[acc], db, q_lengths, db_positions,
        lam, kk, query_names, _details,
    )


def _select_best_hits(
    a_q, a_p, a_raw, db, q_lengths, db_positions, lam, kk, query_names,
    _details,
):
    """Best hit per gene over the final accepted pairs: the head of the
    swapped-back list under Matcher::compareHits — for a fixed gene: int
    bitscore desc, profile length asc, profile id asc (E_report is
    monotone in int bits at fixed gene length and DB size, so E asc ==
    bits desc). Returns the MMseqs2.get_matches()-shaped dict."""
    a_raw = np.asarray(a_raw, np.float64)
    a_bits = int_bitscore(a_raw, lam, kk)
    a_plen = db.lengths[a_p].astype(np.int64)
    order = np.lexsort((a_p, a_plen, -a_bits, a_q))
    a_q, a_p, a_bits = a_q[order], a_p[order], a_bits[order]
    first = np.concatenate([[True], a_q[1:] != a_q[:-1]])
    out: dict = {}
    for qi, gid, bits in zip(a_q[first], a_p[first], a_bits[first]):
        qi, gid, bits = int(qi), int(gid), int(bits)
        row = (
            str(db.names[gid]),
            float(evalue_from_bits(bits, q_lengths[qi], db_positions)),
            bits,
            int(db.taxids[gid]) if db.taxids[gid] > 0 else 1,
        )
        # _details appends (profile length, profile id) — with the int
        # bitscore already in the row, shard merges reconstruct the
        # identical compareHits selection key
        out[query_names[qi]] = row + (int(db.lengths[gid]), gid) if _details else row
    return out


_PM_ROUND = 512  # profile-major pairs aligned per profile per round


def _run_profile_major(
    groups,
    prefilter_group,
    stats_fn,
    cov_fn,
    *,
    sharded,
    nq,
    db,
    q_lengths,
    evalue_threshold,
    min_cov,
    max_rejected,
    db_positions,
    lam,
    kk,
    query_names,
    drop_total,
    out_bound,
    _details,
):
    """Large-input scheduling: prefilter everything, then align in the
    reference's own order — per PROFILE, swapped-prefilter-score
    descending, stopping each profile's walk at the max_rejected-th
    consecutive E-value rejection (genomad/mmseqs2.py:107-122). Rounds of
    up to _PM_ROUND pairs per live profile bound the alignment wasted past
    stop points; the stop rule itself is the vectorized sequential-walk
    mask (_max_rejected_mask) with rejection runs carried across rounds.
    Bit-equal to the streaming mode (tested) — this mode exists because at
    metagenome scale per-profile gene lists grow long enough for the
    reference's stop rule to fire constantly, and aligning everything
    first (the streaming mode) would do that work for nothing."""
    cand_g, cand_p, cand_f = [], [], []
    for g in groups:
        cg = prefilter_group(g)
        for li, qi in enumerate(g):
            ids, scores = cg[li]
            if len(ids):
                # lean i32/f32 records: this table is the mode's dominant
                # host-RAM cost at metagenome scale (~12 B/pair)
                cand_g.append(np.full(len(ids), qi, np.int32))
                cand_p.append(np.asarray(ids, np.int32))
                cand_f.append(np.asarray(scores, np.float32))
    if drop_total[0]:
        import warnings

        warnings.warn(
            f"prefilter: kept the top {out_bound} candidates per query "
            f"by ungapped score (--max-seqs semantics); {drop_total[0]} "
            "weaker candidates dropped across the batch"
        )
    if not cand_g:
        return {}
    genes = np.concatenate(cand_g)
    profs = np.concatenate(cand_p)
    pf = np.concatenate(cand_f)
    # the swapped per-profile walk order: profile asc, prefilter score
    # desc, gene index asc on ties
    order = np.lexsort((genes, -pf, profs))
    genes, profs = genes[order], profs[order]
    seg_start = np.concatenate(
        [[0], np.where(profs[1:] != profs[:-1])[0] + 1]
    ).astype(np.int64)
    seg_end = np.concatenate([seg_start[1:], [len(profs)]]).astype(np.int64)
    cur = seg_start.copy()
    carry = np.zeros(db.n_profiles, np.int64)
    alive = np.ones(len(seg_start), bool)
    acc: list = []
    R = _PM_ROUND  # bounds alignment wasted past stop points
    while np.any(alive):
        live = np.where(alive)[0]
        take = np.minimum(seg_end[live] - cur[live], R)
        offsets = np.concatenate([[0], np.cumsum(take)[:-1]])
        idx = np.repeat(cur[live] - offsets, take) + np.arange(int(take.sum()))
        rq, rp = genes[idx], profs[idx]
        stats = stats_fn(rq, rp)
        ev32 = stats[:, 5] if sharded else stats[:, 3]
        keep1 = ev32 <= np.float32(evalue_threshold)
        if max_rejected:
            aligned, carry, stopped = _max_rejected_mask(
                rp, keep1, carry, int(max_rejected)
            )
        else:
            aligned = np.ones(len(keep1), bool)
            stopped = np.zeros(len(live), bool)
        sel = aligned & keep1
        if np.any(sel):
            acc.append((rq[sel], rp[sel], stats[sel]))
        cur[live] += take
        alive[live] = ~stopped & (cur[live] < seg_end[live])
    if not acc:
        return {}
    a_q = np.concatenate([a for a, _, _ in acc])
    a_p = np.concatenate([b for _, b, _ in acc])
    a_stats = np.concatenate([c for _, _, c in acc], axis=0)
    if sharded:
        pcov = a_stats[:, 6]
    else:
        pcov = cov_fn(a_q, a_p, a_stats[:, 1:3])
    ok = pcov >= np.float32(min_cov)
    if not np.any(ok):
        return {}
    return _select_best_hits(
        a_q[ok], a_p[ok], a_stats[ok, 0], db, q_lengths, db_positions,
        lam, kk, query_names, _details,
    )


def _max_rejected_mask(seg_q, keep, carry, max_rejected):
    """Emulate MMseqs2's --max-rejected stop rule on batched results.

    seg_q: (N,) align-stage-QUERY index per pair — the PROFILE id in the
    reference's swapped orientation — grouped in contiguous segments with
    pairs in that query's candidate-list (swapped prefilter score) order;
    keep: (N,) pass-1 accept flags; carry: per-segment-key
    consecutive-rejection runs carried in (all zero for a single full-table
    pass, which is how the production search applies the rule).

    Returns (aligned (N,) — pairs the reference would actually have
    aligned, updated carry, stopped (S,) flags aligned with the order of
    distinct segments in seg_q). A stop triggers AT the max_rejected-th
    consecutive rejection: that pair is aligned (and rejected), everything
    after it in the list is not.
    """
    n = len(keep)
    pos = np.arange(n, dtype=np.int64)
    start = np.concatenate([[True], seg_q[1:] != seg_q[:-1]])
    seg_ids = np.cumsum(start) - 1
    seg_start_pos = pos[start]
    uniq_q = seg_q[start]
    # segmented "last keep position" via offset-encoded maximum.accumulate
    off = seg_ids * np.int64(n + 2)
    kp = np.where(keep, off + pos, np.int64(-1))
    acc = np.maximum.accumulate(kp)
    has_keep = acc >= off
    no_keep_base = seg_start_pos[seg_ids] - 1 - carry[uniq_q][seg_ids]
    last_keep = np.where(has_keep, acc - off, no_keep_base)
    run = pos - last_keep  # consecutive rejections ending at i (0 at keeps)
    trigger = (~keep) & (run >= max_rejected)
    tpos = np.where(trigger, pos, np.int64(n))
    stop_pos = np.minimum.reduceat(tpos, seg_start_pos)
    aligned = pos <= stop_pos[seg_ids]
    seg_end_pos = np.concatenate([seg_start_pos[1:], [n]]) - 1
    stopped = stop_pos < n
    new_carry = carry.copy()
    new_carry[uniq_q] = np.where(stopped, 0, run[seg_end_pos])
    return aligned, new_carry, stopped


def _fetch_pending(out: np.ndarray, pending) -> None:
    """Materialize per-chunk device results into host rows with ONE
    device->host fetch: the chunks concatenate on device first, so the
    sync costs one transfer round trip instead of one per chunk — on a
    tunneled device the per-fetch round-trip latency, not the bytes,
    dominated stage 2 at small DB scale."""
    if not pending:
        return
    if len(pending) == 1:
        chunk, dev = pending[0]
        out[chunk] = np.asarray(dev)[: len(chunk)]
        return
    stacked = np.asarray(jnp.concatenate([dev for _, dev in pending], axis=0))
    base = 0
    for chunk, dev in pending:
        out[chunk] = stacked[base : base + len(chunk)]
        base += dev.shape[0]


def _chunk_size(Lp: int) -> int:
    """Pairs per device dispatch for a profile-length bucket.

    Round-5 measured sweep on the tunneled v5e (Lq=256, gathered-operand
    _sw_fwd_gate program): throughput peaks at ~2048 pairs/dispatch for
    every Lp <= 512 (170-203 kpairs/s) and COLLAPSES up to 20x beyond
    ~4096 (Lp=256: 203 kpairs/s at 1-2k, 9 kpairs/s at 16k — the round-4
    0.35 GB-budget chunks of 8-16k pairs sat in that cliff all of round
    4). The cliff tracks the gathered profile operand (B, Lp, 21) leaving
    a cacheable size, so the cap scales down with Lp past 512. Dispatch
    overhead is async and amortizes at this size (measured: consecutive
    2048-pair dispatches sustain the per-dispatch peak)."""
    return max(32, min(2048, (2048 * 512) // max(Lp, 1)))


def _chunk_pad(n: int, total: int, cap: int) -> int:
    """Padded pair count for one dispatch chunk. Production-size rounds
    (more than one full chunk) always use the bucket's single ``cap``
    shape so one compiled program per operand bucket serves the whole
    search; small searches pad to a power of two (floor 256, clamped to
    the cap — long-profile buckets cap below 256 precisely because big
    operands at those lengths hit the measured dispatch-size collapse)."""
    if total > cap:
        return cap
    return min(cap, max(256, 1 << (max(n, 1) - 1).bit_length()))


def _pair_fwd_host(
    pairs_q,
    pairs_p,
    db,
    q_lengths,
    get_padded_queries,
    get_staged_profiles,
    ka,
):
    """(N, 4) forward-pass stats (score, end_i, end_j, evalue32) via async
    per-bucket dispatches on the default device. All chunks are dispatched
    before the single sync pass, so host<->device transfer round-trips
    overlap device compute."""
    N = len(pairs_q)
    out = np.empty((N, 4), np.float32)
    qb = _bucket_bound(q_lengths[pairs_q])
    pb = _bucket_bound(db.lengths[pairs_p])
    pending = []
    for qb_i in np.unique(qb):
        all_q_dev = get_padded_queries(qb_i)
        for pb_i in np.unique(pb[qb == qb_i]):
            sel = np.where((qb == qb_i) & (pb == pb_i))[0]
            p_ids, all_p21_dev, plen_dev = get_staged_profiles(pb_i)
            cap = _chunk_size(_BOUNDS[pb_i])
            for chunk_start in range(0, len(sel), cap):
                chunk = sel[chunk_start : chunk_start + cap]
                n_pad = _chunk_pad(len(chunk), len(sel), cap)
                idx = np.zeros((2, n_pad), np.int32)
                idx[0, : len(chunk)] = pairs_q[chunk]
                idx[1, : len(chunk)] = np.searchsorted(p_ids, pairs_p[chunk])
                stats_dev = _sw_fwd_gate(
                    all_q_dev, all_p21_dev, plen_dev, jnp.asarray(idx), ka
                )
                pending.append((chunk, stats_dev))
    _fetch_pending(out, pending)
    return out


def _pair_cov_host(
    pairs_q,
    pairs_p,
    ends,
    db,
    q_lengths,
    get_padded_queries,
    get_staged_profiles,
):
    """(M,) reverse-pass PROFILE coverage for E-value survivors.

    ends: (M, 2) f32 forward (end_i, end_j) per pair."""
    M = len(pairs_q)
    out = np.empty(M, np.float32)
    qb = _bucket_bound(q_lengths[pairs_q])
    pb = _bucket_bound(db.lengths[pairs_p])
    pending = []
    for qb_i in np.unique(qb):
        all_q_dev = get_padded_queries(qb_i)
        for pb_i in np.unique(pb[qb == qb_i]):
            sel = np.where((qb == qb_i) & (pb == pb_i))[0]
            p_ids, all_p21_dev, plen_dev = get_staged_profiles(pb_i)
            cap = _chunk_size(_BOUNDS[pb_i])
            for chunk_start in range(0, len(sel), cap):
                chunk = sel[chunk_start : chunk_start + cap]
                n_pad = _chunk_pad(len(chunk), len(sel), cap)
                idx = np.zeros((2, n_pad), np.int32)
                idx[0, : len(chunk)] = pairs_q[chunk]
                idx[1, : len(chunk)] = np.searchsorted(p_ids, pairs_p[chunk])
                e = np.zeros((2, n_pad), np.float32)
                e[:, : len(chunk)] = ends[chunk].T
                cov_dev = _sw_rev_cov(
                    all_q_dev, all_p21_dev, plen_dev, jnp.asarray(idx),
                    jnp.asarray(e),
                )
                pending.append((chunk, cov_dev))
    _fetch_pending(out, pending)
    return out


@functools.partial(jax.jit, static_argnames=("mesh", "replicate_out"))
def _sharded_pair_stats_program(
    mesh,
    all_q: jnp.ndarray,
    p_stack: jnp.ndarray,
    plen_stack: jnp.ndarray,
    idx_stack: jnp.ndarray,
    ka: jnp.ndarray,
    replicate_out: bool = False,
):
    """ONE jitted (data x db)-sharded SW program: queries replicate, the
    profile DB shards over 'db' (the native replacement for MMseqs2's
    serial ``--splits`` chunking, genomad/mmseqs2.py:83-95), and the pair
    batch shards over BOTH mesh axes — the 'data' axis carries query-batch
    data parallelism, the reference's process-pool analog (SURVEY §2.5).
    Each device aligns its pair slice and emits per-pair stats + the f32
    profile-oriented gate columns (_gate_ev + profile coverage — identical
    to the single-device gate).

    all_q: (NQ, Lq) replicated; p_stack: (n_db * P_loc, Lp, 21) sharded on
    'db'; plen_stack: (n_db * P_loc,) profile lengths sharded on 'db';
    idx_stack: (n_data, n_db, 2, N) per-device (query row, local profile
    row). Returns (n_data, n_db, N, 7) sharded on ('data', 'db'), or —
    with ``replicate_out`` (multi-host mode) — all-gathered to every
    device so EVERY process can read the full stats tensor locally (a
    sharded output is not addressable across hosts; the gathered stats
    are small relative to the alignment work).
    """
    from jax.sharding import PartitionSpec as P

    def body(all_q, p_loc, plen_loc, idx, ka):
        idx = idx[0, 0]  # strip the per-device stack axes
        q = jnp.take(all_q, idx[0], axis=0)
        p = jnp.take(p_loc, idx[1], axis=0).astype(jnp.float32)
        stats = _pair_stats_ops(q, p)
        plen = jnp.take(plen_loc, idx[1]).astype(jnp.float32)
        ev = _gate_ev(stats[:, 0], plen, ka)
        pcov = (stats[:, 2] - stats[:, 4] + 1.0) / plen
        out = jnp.concatenate([stats, ev[:, None], pcov[:, None]], axis=1)
        out = out[None, None]
        if replicate_out:
            out = jax.lax.all_gather(out, "data", axis=0, tiled=True)
            out = jax.lax.all_gather(out, "db", axis=1, tiled=True)
        return out

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("db"), P("db"), P("data", "db"), P()),
        out_specs=P() if replicate_out else P("data", "db"),
        check_vma=False,
    )(all_q, p_stack, plen_stack, idx_stack, ka)


def _pair_stats_sharded(
    pairs_q,
    pairs_p,
    db,
    q_lengths,
    mesh,
    get_padded_queries,
    get_staged_shards,
    ka,
):
    """(N, 7) per-pair SW stats on a (data, db) mesh: pairs route to the
    device owning their profile's db-shard, balanced round-robin over the
    'data' axis; results scatter back into input-pair order on the host.
    On a multi-process (pod) mesh the program all-gathers its output so
    every host reads identical stats and the host-side merge stays
    deterministic across processes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genomad_tpu.parallel.mesh import put_global

    multihost = jax.process_count() > 1
    n_data = mesh.shape.get("data", 1)
    n_db = mesh.shape.get("db", 1)
    N = len(pairs_q)
    out = np.empty((N, 7), np.float32)
    qb = _bucket_bound(q_lengths[pairs_q])
    pb = _bucket_bound(db.lengths[pairs_p])
    pending = []
    for qb_i in np.unique(qb):
        all_q_dev = get_padded_queries(qb_i)
        for pb_i in np.unique(pb[qb == qb_i]):
            sel = np.where((qb == qb_i) & (pb == pb_i))[0]
            ids, p_loc, arr_dev, plen_dev = get_staged_shards(pb_i)
            local = np.searchsorted(ids, pairs_p[sel])
            owner = local // p_loc
            order = np.argsort(owner, kind="stable")
            counts = np.bincount(owner, minlength=n_db)
            offsets = np.concatenate([[0], np.cumsum(counts)])
            # cell (g, d) gets every n_data-th pair of db-shard d's list —
            # round-robin over 'data' balances uneven shard loads
            cell_width = -(-int(counts.max()) // n_data) if counts.max() else 0
            cell_cap = _chunk_size(_BOUNDS[pb_i])
            for start in range(0, max(cell_width, 1), cell_cap):
                width = min(cell_cap, cell_width - start)
                if width <= 0:
                    break
                n_pad = _pow2(width, floor=min(256, cell_cap))
                idx_stack = np.zeros((n_data, n_db, 2, n_pad), np.int32)
                placement = []  # (pair rows, g, d, slot_base)
                for d in range(n_db):
                    rows_d = order[offsets[d] : offsets[d + 1]]
                    for g in range(n_data):
                        cell_rows = rows_d[g::n_data][start : start + width]
                        if not len(cell_rows):
                            continue
                        k = len(cell_rows)
                        idx_stack[g, d, 0, :k] = pairs_q[sel[cell_rows]]
                        idx_stack[g, d, 1, :k] = local[cell_rows] % p_loc
                        placement.append((sel[cell_rows], g, d, k))
                stats_dev = _sharded_pair_stats_program(
                    mesh,
                    all_q_dev,
                    arr_dev,
                    plen_dev,
                    put_global(
                        idx_stack, NamedSharding(mesh, P("data", "db"))
                    ),
                    put_global(np.asarray(ka), NamedSharding(mesh, P())),
                    replicate_out=multihost,
                )
                pending.append((placement, stats_dev))
    for placement, stats_dev in pending:
        stats = np.asarray(stats_dev)
        for rows, g, d, k in placement:
            out[rows] = stats[g, d, :k]
    return out


def search_sharded(query_names, query_seqs, db: ProfileDB, n_shards: int, **kwargs) -> dict:
    """DB-sharded search: run each shard independently and merge best hits
    on (int bitscore desc, profile length asc, global profile id asc) —
    the SAME Matcher::compareHits key as ``search``'s in-batch best-hit
    selection (the reference's swapped-back E-value is a pure function of
    the int bitscore at fixed gene length and DB size, so E asc == bits
    desc), so the result is identical to a single-shard search at any
    shard count. The align-stage E-gate's search space is the protein
    query set (shard-invariant by construction); ``db_positions`` passes
    the FULL DB size so reported E-values are shard-invariant too.

    On a pod this maps shards onto the 'db' mesh axis; the merge is an
    allreduce-argmax over shards. The host-loop version here exercises the
    identical merge semantics.
    """
    merged: dict[str, tuple] = {}  # q -> ((-bits, plen, g_gid), 4-tuple)
    kwargs.setdefault("db_positions", max(db.total_positions, 1))
    for shard_i in range(n_shards):
        shard = db.shard(n_shards, shard_i)
        hits = search(query_names, query_seqs, shard, _details=True, **kwargs)
        for q, (target, ev, bits, taxid, plen, gid) in hits.items():
            # shards are strided (profiledb.ProfileDB.shard): local id ->
            # global id recovers search()'s exact tie-break ordering
            g_gid = shard_i + n_shards * gid
            key = (-bits, plen, g_gid)
            cur = merged.get(q)
            if cur is None or key < cur[0]:
                merged[q] = (key, (target, ev, bits, taxid))
    return {q: v[1] for q, v in merged.items()}
