// Native prefilter: query k-mer lookup + ungapped diagonal extension.
//
// C++ counterpart of genomad_tpu.ops.protein_search.prefilter_query — the
// host-side stage that replaces MMseqs2's C++ prefilter (reference chain:
// genomad/mmseqs2.py:76-96, `mmseqs prefilter -k 5 --min-ungapped-score 25
// --max-seqs 10000000`). The device-side alignment stays in JAX; this stage
// is a sparse integer workload (inverted-index lookups), hence native CPU.
//
// Algorithm:
//   1. each query 5-mer expands into its similar-k-mer list (score vs the
//      query window >= kmer_thr under the substitution matrix — MMseqs2's
//      ``-s`` semantics). The expansion is generated from PRECOMPUTED
//      2-mer x 3-mer product tables built once per threshold: for a query
//      k-mer split into prefix(2)+suffix(3), the similar 5-mers are the
//      pairs (x2, x3) with s2(x2) + s3(x3) >= thr, enumerated from the two
//      score-sorted sub-lists in output-sensitive time. This replaces the
//      per-query-position branch-and-bound DFS (which recomputed the same
//      expansion for every occurrence and dominated the prefilter).
//   2. every expanded k-mer is looked up in the direct offset table over
//      the 20^5 code space; each index entry becomes a (profile, diagonal)
//      hit processed in O(1) against per-profile EPOCH-STAMPED diagonal
//      tables (last_epoch/last_diag, ~2 MB at 227k profiles — cache
//      resident). A hit whose profile's stamped diagonal matches is a
//      double k-mer match (MMseqs2's double-match criterion) and pushes a
//      candidate; the stamp tables replace the per-query radix sort of the
//      full hit vector (~1M keys/query at production DB scale), which
//      dominated the prefilter. Like MMseqs2's QueryMatcher, the table
//      keeps only the LAST diagonal per profile, so interleaved-diagonal
//      hit patterns can miss a double match — the same approximation the
//      reference engine ships with (mmseqs2 prefiltering/QueryMatcher.cpp
//      diagonalPrev). Exact-k-mer mode (no expansion) needs one hit per
//      diagonal, so every first hit is a candidate and no approximation
//      arises;
//   3. candidates (a few thousand per query) are sorted and deduplicated;
//   4. qualifying diagonals run Kadane's maximal-subarray scan over the
//      PSSM scores; profiles whose best diagonal reaches
//      min_ungapped_score are emitted SORTED BY SCORE DESCENDING (id
//      ascending on ties) — the prefilter result order MMseqs2 feeds its
//      aligner, which stage 2 relies on for --max-rejected semantics.
//
// Plain C ABI for ctypes; no Python headers required.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int K = 5;
constexpr int NAA = 20;
constexpr int N2 = NAA * NAA;            // 400
constexpr int N3 = NAA * NAA * NAA;      // 8000
constexpr uint32_t DIAG_BITS = 21;       // diag + offset fits in 21 bits
constexpr uint32_t DIAG_OFF = 1u << 20;  // supports |diag| < 2^20
// Max query distance between the two k-mer matches of a double hit: pairs
// further apart than the scoring window could not both contribute to the
// windowed ungapped score anyway, and dropping them removes the bulk of
// the background double-hit noise at production DB scale.
constexpr uint32_t PAIR_DIST = 32;

// --- similar-k-mer product tables (one instance per threshold) -------------

struct ExpTables {
    float thr;
    // l2[c]: target 2-mers similar to query 2-mer c, sorted by score desc.
    std::vector<int32_t> l2_code;
    std::vector<float> l2_score;
    std::vector<int64_t> l2_off;  // N2 + 1
    // l3[c]: target 3-mers similar to query 3-mer c, sorted by score desc.
    std::vector<int32_t> l3_code;
    std::vector<float> l3_score;
    std::vector<int64_t> l3_off;  // N3 + 1
};

// Build the product tables for one (matrix, threshold). Pruning bounds:
// an l2 entry can participate iff s2 >= thr - max possible s3 (3*maxM);
// an l3 entry iff s3 >= thr - max possible s2 (2*maxM) — so every pair
// (x2, x3) with s2+s3 >= thr survives the pruning of both sub-lists.
ExpTables build_tables(const float* subst, float thr) {
    ExpTables t;
    t.thr = thr;
    float maxM = subst[0];
    for (int i = 0; i < NAA * NAA; ++i) maxM = std::max(maxM, subst[i]);
    const float prune2 = thr - 3.0f * maxM;
    const float prune3 = thr - 2.0f * maxM;

    t.l2_off.assign(N2 + 1, 0);
    {
        std::vector<std::pair<float, int32_t>> buf;
        std::vector<int32_t> codes;
        std::vector<float> scores;
        for (int c = 0; c < N2; ++c) {
            int a0 = c / NAA, a1 = c % NAA;
            buf.clear();
            for (int b0 = 0; b0 < NAA; ++b0) {
                float s0 = subst[a0 * NAA + b0];
                for (int b1 = 0; b1 < NAA; ++b1) {
                    float s = s0 + subst[a1 * NAA + b1];
                    if (s >= prune2) buf.emplace_back(s, b0 * NAA + b1);
                }
            }
            std::sort(buf.begin(), buf.end(), [](auto& x, auto& y) {
                return x.first != y.first ? x.first > y.first
                                          : x.second < y.second;
            });
            for (auto& [s, code] : buf) {
                codes.push_back(code);
                scores.push_back(s);
            }
            t.l2_off[c + 1] = static_cast<int64_t>(codes.size());
        }
        t.l2_code = std::move(codes);
        t.l2_score = std::move(scores);
    }

    // l3: 8000 independent lists; parallelize the enumeration.
    unsigned n_workers = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::vector<int32_t>> codes_per(N3);
    std::vector<std::vector<float>> scores_per(N3);
    std::atomic<int> next{0};
    auto worker = [&]() {
        std::vector<std::pair<float, int32_t>> buf;
        for (;;) {
            int c = next.fetch_add(1);
            if (c >= N3) break;
            int a0 = c / N2, a1 = (c / NAA) % NAA, a2 = c % NAA;
            buf.clear();
            for (int b0 = 0; b0 < NAA; ++b0) {
                float s0 = subst[a0 * NAA + b0];
                if (s0 + 2.0f * maxM < prune3) continue;
                for (int b1 = 0; b1 < NAA; ++b1) {
                    float s1 = s0 + subst[a1 * NAA + b1];
                    if (s1 + maxM < prune3) continue;
                    for (int b2 = 0; b2 < NAA; ++b2) {
                        float s = s1 + subst[a2 * NAA + b2];
                        if (s >= prune3)
                            buf.emplace_back(s, (b0 * NAA + b1) * NAA + b2);
                    }
                }
            }
            std::sort(buf.begin(), buf.end(), [](auto& x, auto& y) {
                return x.first != y.first ? x.first > y.first
                                          : x.second < y.second;
            });
            codes_per[c].reserve(buf.size());
            scores_per[c].reserve(buf.size());
            for (auto& [s, code] : buf) {
                codes_per[c].push_back(code);
                scores_per[c].push_back(s);
            }
        }
    };
    std::vector<std::thread> threads;
    for (unsigned i = 1; i < n_workers; ++i) threads.emplace_back(worker);
    worker();
    for (auto& th : threads) th.join();

    t.l3_off.assign(N3 + 1, 0);
    int64_t total = 0;
    for (int c = 0; c < N3; ++c) {
        total += static_cast<int64_t>(codes_per[c].size());
        t.l3_off[c + 1] = total;
    }
    t.l3_code.reserve(total);
    t.l3_score.reserve(total);
    for (int c = 0; c < N3; ++c) {
        t.l3_code.insert(t.l3_code.end(), codes_per[c].begin(),
                         codes_per[c].end());
        t.l3_score.insert(t.l3_score.end(), scores_per[c].begin(),
                          scores_per[c].end());
    }
    return t;
}

// Process-lifetime cache: one table set per (threshold, matrix checksum).
const ExpTables* get_tables(const float* subst, float thr) {
    static std::mutex mu;
    static std::map<std::pair<uint64_t, float>, ExpTables> cache;
    uint64_t csum = 0;
    for (int i = 0; i < NAA * NAA; ++i) {
        uint32_t bits;
        std::memcpy(&bits, subst + i, 4);
        csum = csum * 1099511628211ull + bits;
    }
    std::lock_guard<std::mutex> lock(mu);
    auto key = std::make_pair(csum, thr);
    auto it = cache.find(key);
    if (it == cache.end())
        it = cache.emplace(key, build_tables(subst, thr)).first;
    return &it->second;
}

// --- optional stage stats (GENOMAD_PREFILTER_STATS=1) ----------------------

struct Stats {
    std::atomic<int64_t> hits{0};
    std::atomic<int64_t> codes{0};
    std::atomic<int64_t> cands{0};
    std::atomic<int64_t> enum_ns{0};
    std::atomic<int64_t> sort_ns{0};
    std::atomic<int64_t> kadane_ns{0};
};
Stats g_stats;
bool stats_enabled() {
    static const bool on = [] {
        const char* v = std::getenv("GENOMAD_PREFILTER_STATS");
        return v && v[0] == '1';
    }();
    return on;
}

// --- per-worker scratch (reused across queries) ----------------------------

struct Scratch {
    // per-profile stamp tables (see file comment, step 2), PACKED so each
    // hit costs one cache access per table instead of 2-3:
    //   last[p] = epoch(22b) << 37 | udiag(21b) << 16 | qpos(16b)
    //     — detects the second hit on a diagonal within PAIR_DIST;
    //   cand_mark[p] = epoch(22b) << 21 | udiag(21b)
    //     — deduplicates candidate pushes (only the FIRST double hit of a
    //       (profile, diagonal) pushes; without this a true homologous
    //       diagonal with a run of n matches pushes n-1 duplicates and
    //       the candidate sort dominates the whole prefilter).
    std::vector<uint64_t> last;
    std::vector<uint64_t> cand_mark;
    uint64_t epoch = 0;
    // candidate key (profile << DIAG_BITS | udiag) + first-double-hit qpos
    std::vector<std::pair<uint64_t, uint32_t>> cand;
    std::vector<std::pair<float, int32_t>> selected;  // (score, profile)

    void ensure(int64_t n_profiles) {
        if (static_cast<int64_t>(last.size()) < n_profiles ||
            epoch >= (1u << 22) - 2) {
            last.assign(n_profiles, 0);
            cand_mark.assign(n_profiles, 0);
            epoch = 0;
        }
    }
};

}  // namespace

extern "C" {

// Returns the TOTAL number of selected profiles (min(total, max_out) are
// written to out_profiles/out_scores in ungapped-score-descending order;
// the caller logs total - written as dropped, never silently). Inputs:
//   code_table: (20^5 + 1) int32 offsets — entries of code c are
//     [code_table[c], code_table[c+1]) in entry_profiles/entry_positions
//   query_codes: Lq-k+1 k-mer codes (-1 = invalid)
//   residues: Lq int8 residue indices (20 = unknown)
//   pssm: flat (total_positions, 20) float32
//   offsets: (P+1) int64 row offsets into pssm
//   subst/kmer_thr: 20x20 substitution matrix + similar-k-mer score
//     threshold for query-side k-mer expansion (MMseqs2 ``-s`` semantics);
//     subst == nullptr or kmer_thr >= 1e30 disables expansion (exact
//     k-mers only). Mirrors genomad_tpu.ops.blosum.similar_kmers.
//   out_scores: may be nullptr (scores discarded).
static int64_t prefilter_query_impl(
    const int32_t* code_table,
    const int32_t* entry_profiles,
    const int32_t* entry_positions,
    int64_t n_profiles,
    const int64_t* query_codes,
    int64_t n_codes,
    const int8_t* residues,
    int64_t query_length,
    const float* pssm,
    const int64_t* offsets,
    const int32_t* lengths,
    float min_ungapped_score,
    const ExpTables* tables,
    int32_t* out_profiles,
    float* out_scores,
    int64_t max_out,
    Scratch& scratch) {
    const bool expand = tables != nullptr;
    const bool stats = stats_enabled();
    scratch.ensure(n_profiles);
    const uint64_t epoch = ++scratch.epoch;
    uint64_t* last = scratch.last.data();
    uint64_t* cand_mark = scratch.cand_mark.data();
    auto& cand = scratch.cand;
    cand.clear();
    int64_t n_hits = 0, n_exp_codes = 0;
    auto t_enum0 = std::chrono::steady_clock::now();
    // 1-2. expansion + index lookups -> O(1) stamp-table hit processing.
    // Expansion mode: a candidate needs two hits on the same (profile,
    // diagonal); exact mode: every first hit is a candidate.
    auto push_hits = [&](int64_t code, int64_t q) {
        const int32_t b = code_table[code], e = code_table[code + 1];
        n_hits += e - b;
        ++n_exp_codes;
        for (int32_t i = b; i < e; ++i) {
            const int32_t p = entry_profiles[i];
            const uint32_t udiag = static_cast<uint32_t>(
                entry_positions[i] - static_cast<int32_t>(q) + DIAG_OFF);
            const uint64_t key_hi = (epoch << 37) |
                                    (static_cast<uint64_t>(udiag) << 16);
            const uint64_t prev = last[p];
            if ((prev >> 16) == (key_hi >> 16) &&
                static_cast<uint64_t>(q) - (prev & 0xFFFF) <= PAIR_DIST) {
                // second match on this diagonal within PAIR_DIST; push
                // once per (p, diag)
                const uint64_t mark = (epoch << DIAG_BITS) | udiag;
                if (cand_mark[p] != mark) {
                    cand_mark[p] = mark;
                    cand.emplace_back(
                        (static_cast<uint64_t>(p) << DIAG_BITS) | udiag,
                        static_cast<uint32_t>(q));
                }
            } else {
                last[p] = key_hi | static_cast<uint64_t>(q & 0xFFFF);
                if (!expand)
                    cand.emplace_back(
                        (static_cast<uint64_t>(p) << DIAG_BITS) | udiag,
                        static_cast<uint32_t>(q));
            }
        }
    };
    for (int64_t q = 0; q < n_codes; ++q) {
        int64_t code = query_codes[q];
        if (code < 0) continue;
        if (!expand) {
            push_hits(code, q);
            continue;
        }
        const int32_t c2 = static_cast<int32_t>(code / N3);
        const int32_t c3 = static_cast<int32_t>(code % N3);
        const int64_t b3 = tables->l3_off[c3], e3 = tables->l3_off[c3 + 1];
        if (b3 == e3) continue;
        const float top3 = tables->l3_score[b3];
        for (int64_t i2 = tables->l2_off[c2]; i2 < tables->l2_off[c2 + 1];
             ++i2) {
            const float s2 = tables->l2_score[i2];
            // l2 sorted desc: once even the best suffix fails, all
            // remaining prefixes fail too
            if (s2 + top3 < tables->thr) break;
            const float need = tables->thr - s2;
            const int64_t base =
                static_cast<int64_t>(tables->l2_code[i2]) * N3;
            for (int64_t i3 = b3; i3 < e3; ++i3) {
                if (tables->l3_score[i3] < need) break;
                const int64_t c = base + tables->l3_code[i3];
                // overlap the entry-list fetch of the next similar k-mer
                // with processing of the current one
                if (i3 + 1 < e3 && tables->l3_score[i3 + 1] >= need)
                    __builtin_prefetch(
                        &code_table[base + tables->l3_code[i3 + 1]]);
                push_hits(c, q);
            }
        }
    }
    auto t_enum1 = std::chrono::steady_clock::now();
    // 3. sort + dedup the candidate diagonals (grouped by profile so the
    // Kadane passes of one profile's diagonals reuse its cached PSSM block)
    std::sort(cand.begin(), cand.end());
    auto t_sort1 = std::chrono::steady_clock::now();
    auto& selected = scratch.selected;
    selected.clear();
    float cur_best = -1.0f;
    int32_t cur_profile = -1;
    auto flush = [&]() {
        if (cur_profile >= 0 && cur_best >= min_ungapped_score)
            selected.emplace_back(cur_best, cur_profile);
    };
    // Extension window around the first double hit (query coords). The
    // ungapped score is the maximal subarray CONTAINED in the window — a
    // local-extension approximation of the full-diagonal score. The window
    // exists to gate at min_ungapped_score (25): a homologous region
    // reaches 25 well within ~2*W+K residues of the double hit; the gapped
    // stage (full SW on device) rescores every survivor anyway, so a
    // longer window would only refine candidate ORDER, at ~W-proportional
    // DRAM cost that dominates the whole prefilter at production DB scale.
    // (MMseqs2 likewise caps its prefilter diagonal scores — at the uchar
    // saturation bound of its SIMD scorer.) Exact-k-mer mode (tests, small
    // DBs, the numpy-fallback contract) keeps the full-diagonal scan.
    const int64_t W = expand ? 16 : (query_length > DIAG_OFF
                                         ? query_length
                                         : static_cast<int64_t>(DIAG_OFF));
    size_t i = 0;
    const size_t n = cand.size();
    while (i < n) {
        size_t j = i + 1;
        while (j < n && cand[j].first == cand[i].first) ++j;
        // look-ahead: the sorted candidate list makes upcoming PSSM
        // windows fully predictable — overlap their first cache lines
        // with the current candidate's scan (per-candidate first-touch
        // misses are the scan's latency floor once W is small)
        if (i + 4 < n) {
            const uint64_t k4 = cand[i + 4].first;
            const int32_t p4 = static_cast<int32_t>(k4 >> DIAG_BITS);
            const int32_t d4 = static_cast<int32_t>(
                (k4 & ((1u << DIAG_BITS) - 1)) - DIAG_OFF);
            const int64_t hq4 = cand[i + 4].second;
            const float* a4 =
                pssm + (offsets[p4] + d4 + std::max<int64_t>(
                                               d4 < 0 ? -d4 : 0, hq4 - W)) *
                           NAA;
            for (int r = 0; r < 8; r += 2)
                __builtin_prefetch(a4 + r * NAA);
        }
        {
            const uint64_t key = cand[i].first;
            const int64_t hit_q = cand[i].second;
            const int32_t p = static_cast<int32_t>(key >> DIAG_BITS);
            const int32_t diag = static_cast<int32_t>(
                (key & ((1u << DIAG_BITS) - 1)) - DIAG_OFF);
            if (p != cur_profile) {
                flush();
                cur_profile = p;
                cur_best = -1.0f;
            }
            // 4. Kadane maximal-subarray scan along the diagonal, windowed
            const int64_t p_len = lengths[p];
            const int64_t q_lo = std::max<int64_t>(diag < 0 ? -diag : 0,
                                                   hit_q - W);
            const int64_t q_hi = std::min<int64_t>(
                std::min<int64_t>(query_length, p_len - diag),
                hit_q + W + K);
            if (q_hi > q_lo) {
                const float* prof = pssm + (offsets[p] + diag) * NAA;
                float running = 0.0f, best = 0.0f;
                for (int64_t t = q_lo; t < q_hi; ++t) {
                    // PSSM rows are 80 B apart — every step opens a new
                    // cache line; streaming ahead overlaps the misses
                    if (t + 8 < q_hi)
                        __builtin_prefetch(prof + (t + 8) * NAA);
                    const int8_t res = residues[t];
                    const float s =
                        res < NAA ? prof[t * NAA + res] : 0.0f;
                    running += s;
                    if (running < 0.0f) running = 0.0f;
                    if (running > best) best = running;
                }
                if (best > cur_best) cur_best = best;
            }
        }
        i = j;
    }
    flush();
    if (stats) {
        auto t_end = std::chrono::steady_clock::now();
        g_stats.hits += n_hits;
        g_stats.codes += n_exp_codes;
        g_stats.cands += static_cast<int64_t>(cand.size());
        g_stats.enum_ns +=
            std::chrono::duration_cast<std::chrono::nanoseconds>(t_enum1 -
                                                                 t_enum0)
                .count();
        g_stats.sort_ns +=
            std::chrono::duration_cast<std::chrono::nanoseconds>(t_sort1 -
                                                                 t_enum1)
                .count();
        g_stats.kadane_ns +=
            std::chrono::duration_cast<std::chrono::nanoseconds>(t_end -
                                                                 t_sort1)
                .count();
    }
    // output order: ungapped score descending, profile id ascending on ties
    // (MMseqs2's prefilter result order, consumed by --max-rejected)
    std::sort(selected.begin(), selected.end(), [](auto& x, auto& y) {
        return x.first != y.first ? x.first > y.first : x.second < y.second;
    });
    const int64_t n_out =
        std::min<int64_t>(static_cast<int64_t>(selected.size()), max_out);
    for (int64_t k = 0; k < n_out; ++k) {
        out_profiles[k] = selected[k].second;
        if (out_scores) out_scores[k] = selected[k].first;
    }
    return static_cast<int64_t>(selected.size());
}

int64_t prefilter_query(
    const int32_t* code_table,
    const int32_t* entry_profiles,
    const int32_t* entry_positions,
    int64_t n_profiles,
    const int64_t* query_codes,
    int64_t n_codes,
    const int8_t* residues,
    int64_t query_length,
    const float* pssm,
    const int64_t* offsets,
    const int32_t* lengths,
    float min_ungapped_score,
    const float* subst,
    float kmer_thr,
    int32_t* out_profiles,
    float* out_scores,
    int64_t max_out) {
    const ExpTables* tables =
        (subst != nullptr && kmer_thr < 1e30f) ? get_tables(subst, kmer_thr)
                                               : nullptr;
    Scratch scratch;
    return prefilter_query_impl(
        code_table, entry_profiles, entry_positions, n_profiles, query_codes,
        n_codes, residues, query_length, pssm, offsets, lengths,
        min_ungapped_score, tables, out_profiles, out_scores, max_out,
        scratch);
}

// Batched, multithreaded driver: runs the prefilter over n_queries
// concatenated queries (CSR layout) with n_threads workers. Outputs are
// written per query into out_profiles/out_scores[q * max_out_per_query ..]
// with TOTAL (uncapped) selection counts in out_counts[q] — the caller
// clamps and logs any excess as dropped. Replaces the reference's
// `--threads` knob for this stage (genomad/mmseqs2.py:83).
int64_t prefilter_batch(
    const int32_t* code_table,
    const int32_t* entry_profiles,
    const int32_t* entry_positions,
    int64_t n_profiles,
    const int64_t* query_codes,      // concatenated
    const int64_t* code_offsets,     // (n_queries+1)
    const int8_t* residues,          // concatenated
    const int64_t* residue_offsets,  // (n_queries+1)
    int64_t n_queries,
    const float* pssm,
    const int64_t* offsets,
    const int32_t* lengths,
    float min_ungapped_score,
    const float* subst,
    float kmer_thr,
    int32_t* out_profiles,  // (n_queries, max_out_per_query)
    float* out_scores,      // (n_queries, max_out_per_query) or nullptr
    int64_t* out_counts,    // (n_queries)
    int64_t max_out_per_query,
    int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    const ExpTables* tables =
        (subst != nullptr && kmer_thr < 1e30f) ? get_tables(subst, kmer_thr)
                                               : nullptr;
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        Scratch scratch;
        for (;;) {
            int64_t q = next.fetch_add(1);
            if (q >= n_queries) break;
            out_counts[q] = prefilter_query_impl(
                code_table, entry_profiles, entry_positions, n_profiles,
                query_codes + code_offsets[q],
                code_offsets[q + 1] - code_offsets[q],
                residues + residue_offsets[q],
                residue_offsets[q + 1] - residue_offsets[q], pssm, offsets,
                lengths, min_ungapped_score, tables,
                out_profiles + q * max_out_per_query,
                out_scores ? out_scores + q * max_out_per_query : nullptr,
                max_out_per_query, scratch);
        }
    };
    std::vector<std::thread> threads;
    for (int32_t t = 1; t < n_threads; ++t) threads.emplace_back(worker);
    worker();
    for (auto& t : threads) t.join();
    if (stats_enabled() && n_queries > 4) {
        std::fprintf(
            stderr,
            "[prefilter stats] %lld queries: %.2f M hits (%.0f/q), "
            "%.2f M expanded codes (%.0f/q), %.0f cand/q; "
            "enum %.1f ms/q, sort %.1f ms/q, kadane %.1f ms/q "
            "(thread-summed)\n",
            static_cast<long long>(n_queries),
            g_stats.hits.load() / 1e6, g_stats.hits.load() / double(n_queries),
            g_stats.codes.load() / 1e6,
            g_stats.codes.load() / double(n_queries),
            g_stats.cands.load() / double(n_queries),
            g_stats.enum_ns.load() / 1e6 / n_queries,
            g_stats.sort_ns.load() / 1e6 / n_queries,
            g_stats.kadane_ns.load() / 1e6 / n_queries);
        g_stats.hits = g_stats.codes = g_stats.cands = 0;
        g_stats.enum_ns = g_stats.sort_ns = g_stats.kadane_ns = 0;
    }
    return n_queries;
}

}  // extern "C"
