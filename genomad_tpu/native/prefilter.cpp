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
//      the 20^5 code space; hits append (profile, diagonal) keys to a flat
//      vector (no hash map — sequential writes only);
//   3. the key vector is LSD-radix-sorted; equal-key runs give the per-
//      diagonal match count. In expansion mode a diagonal needs >= 2 hits
//      (MMseqs2's double-k-mer-match criterion) before extension;
//   4. qualifying diagonals run Kadane's maximal-subarray scan over the
//      PSSM scores; profiles whose best diagonal reaches
//      min_ungapped_score are emitted SORTED BY SCORE DESCENDING (id
//      ascending on ties) — the prefilter result order MMseqs2 feeds its
//      aligner, which stage 2 relies on for --max-rejected semantics.
//
// Plain C ABI for ctypes; no Python headers required.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
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

// --- radix sort of (profile << DIAG_BITS | diag) keys ----------------------

void radix_sort_keys(std::vector<uint64_t>& a, std::vector<uint64_t>& tmp) {
    constexpr int BITS = 13;
    constexpr uint32_t MASK = (1u << BITS) - 1;
    size_t n = a.size();
    if (n < 2) return;
    uint64_t max_key = 0;
    for (uint64_t k : a) max_key = std::max(max_key, k);
    tmp.resize(n);
    for (int shift = 0; max_key >> shift; shift += BITS) {
        uint32_t cnt[1u << BITS] = {0};
        for (uint64_t k : a) ++cnt[(k >> shift) & MASK];
        uint32_t sum = 0;
        for (uint32_t& c : cnt) {
            uint32_t v = c;
            c = sum;
            sum += v;
        }
        for (uint64_t k : a) tmp[cnt[(k >> shift) & MASK]++] = k;
        a.swap(tmp);
    }
}

// --- per-worker scratch (reused across queries) ----------------------------

struct Scratch {
    std::vector<uint64_t> hits;
    std::vector<uint64_t> tmp;
    std::vector<std::pair<float, int32_t>> selected;  // (score, profile)
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
    auto& hits = scratch.hits;
    hits.clear();
    auto push_hits = [&](int64_t code, int64_t q) {
        const int32_t b = code_table[code], e = code_table[code + 1];
        for (int32_t i = b; i < e; ++i) {
            uint32_t udiag = static_cast<uint32_t>(
                entry_positions[i] - static_cast<int32_t>(q) + DIAG_OFF);
            hits.push_back(
                (static_cast<uint64_t>(entry_profiles[i]) << DIAG_BITS) |
                udiag);
        }
    };
    // 1-2. expansion + index lookups -> flat (profile, diag) hit keys
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
                push_hits(base + tables->l3_code[i3], q);
            }
        }
    }
    // 3. sort keys; runs of >= min_hits qualify (double-match criterion in
    // expansion mode — suppresses the single-hit noise diagonals that
    // similar-k-mer lists generate in bulk).
    radix_sort_keys(hits, scratch.tmp);
    const size_t min_hits = expand ? 2 : 1;
    auto& selected = scratch.selected;
    selected.clear();
    float cur_best = -1.0f;
    int32_t cur_profile = -1;
    auto flush = [&]() {
        if (cur_profile >= 0 && cur_best >= min_ungapped_score)
            selected.emplace_back(cur_best, cur_profile);
    };
    size_t i = 0;
    const size_t n = hits.size();
    while (i < n) {
        size_t j = i + 1;
        while (j < n && hits[j] == hits[i]) ++j;
        if (j - i >= min_hits) {
            const int32_t p = static_cast<int32_t>(hits[i] >> DIAG_BITS);
            const int32_t diag = static_cast<int32_t>(
                (hits[i] & ((1u << DIAG_BITS) - 1)) - DIAG_OFF);
            if (p != cur_profile) {
                flush();
                cur_profile = p;
                cur_best = -1.0f;
            }
            // 4. Kadane maximal-subarray scan along the diagonal
            const int64_t p_len = lengths[p];
            const int64_t q_start = diag < 0 ? -diag : 0;
            const int64_t p_start = diag > 0 ? diag : 0;
            const int64_t overlap =
                std::min(query_length - q_start, p_len - p_start);
            if (overlap > 0) {
                const float* prof = pssm + offsets[p] * NAA;
                float running = 0.0f, best = 0.0f;
                for (int64_t t = 0; t < overlap; ++t) {
                    const int8_t res = residues[q_start + t];
                    const float s =
                        res < NAA ? prof[(p_start + t) * NAA + res] : 0.0f;
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
    int64_t n_entries,
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
    (void)n_entries;
    const ExpTables* tables =
        (subst != nullptr && kmer_thr < 1e30f) ? get_tables(subst, kmer_thr)
                                               : nullptr;
    Scratch scratch;
    return prefilter_query_impl(
        code_table, entry_profiles, entry_positions, query_codes, n_codes,
        residues, query_length, pssm, offsets, lengths, min_ungapped_score,
        tables, out_profiles, out_scores, max_out, scratch);
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
    int64_t n_entries,
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
    (void)n_entries;
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
                code_table, entry_profiles, entry_positions,
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
    return n_queries;
}

}  // extern "C"
