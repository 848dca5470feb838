// Native prefilter: query k-mer lookup + ungapped diagonal extension.
//
// C++ counterpart of genomad_tpu.ops.protein_search.prefilter_query — the
// host-side stage that replaces MMseqs2's C++ prefilter (reference chain:
// genomad/mmseqs2.py:76-96, `mmseqs prefilter -k 5 --min-ungapped-score 25`).
// The device-side alignment stays in JAX; this stage is pure CPU and
// latency-bound, hence native.
//
// Algorithm (identical to the numpy implementation):
//   1. binary-search each query 5-mer code in the sorted DB k-mer index;
//   2. bucket hits by (profile, diagonal);
//   3. for each candidate diagonal, run Kadane's maximal-subarray scan over
//      the PSSM scores along the diagonal;
//   4. emit profiles whose best diagonal reaches min_ungapped_score.
//
// Plain C ABI for ctypes; no Python headers required.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct DiagKey {
    int32_t profile;
    int32_t diag;
    bool operator==(const DiagKey& o) const {
        return profile == o.profile && diag == o.diag;
    }
};

struct DiagKeyHash {
    size_t operator()(const DiagKey& k) const {
        return (static_cast<size_t>(k.profile) << 20) ^
               static_cast<size_t>(static_cast<uint32_t>(k.diag + (1 << 19)));
    }
};

}  // namespace

extern "C" {

// Returns the number of selected profiles written to out_profiles
// (capacity max_out). Inputs:
//   sorted_kmers/entry_profiles/entry_positions: the inverted index (E entries)
//   query_codes: Lq-k+1 k-mer codes (-1 = invalid)
//   residues: Lq int8 residue indices (20 = unknown)
//   pssm: flat (total_positions, 20) float32
//   offsets: (P+1) int64 row offsets into pssm
//   lengths: (P) int32 profile lengths
int64_t prefilter_query(
    const int64_t* sorted_kmers,
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
    int32_t* out_profiles,
    int64_t max_out) {
    // 1-2. k-mer lookups -> (profile, diagonal) hit counts
    std::unordered_map<DiagKey, int32_t, DiagKeyHash> diagonals;
    for (int64_t q = 0; q < n_codes; ++q) {
        int64_t code = query_codes[q];
        if (code < 0) continue;
        const int64_t* lo =
            std::lower_bound(sorted_kmers, sorted_kmers + n_entries, code);
        const int64_t* hi =
            std::upper_bound(lo, sorted_kmers + n_entries, code);
        for (const int64_t* it = lo; it != hi; ++it) {
            int64_t e = it - sorted_kmers;
            DiagKey key{entry_profiles[e],
                        static_cast<int32_t>(entry_positions[e] - q)};
            ++diagonals[key];
        }
    }
    // 3-4. ungapped extension per candidate diagonal; best score per profile
    std::unordered_map<int32_t, float> best_score;
    for (const auto& [key, count] : diagonals) {
        int32_t p = key.profile;
        int32_t diag = key.diag;
        int64_t p_len = lengths[p];
        int64_t q_start = diag < 0 ? -diag : 0;
        int64_t p_start = diag > 0 ? diag : 0;
        int64_t overlap =
            std::min(query_length - q_start, p_len - p_start);
        if (overlap <= 0) continue;
        const float* prof = pssm + offsets[p] * 20;
        float running = 0.0f, best = 0.0f;
        for (int64_t t = 0; t < overlap; ++t) {
            int8_t res = residues[q_start + t];
            float s = res < 20 ? prof[(p_start + t) * 20 + res] : 0.0f;
            running += s;
            if (running < 0.0f) running = 0.0f;
            if (running > best) best = running;
        }
        auto it = best_score.find(p);
        if (it == best_score.end() || best > it->second) best_score[p] = best;
    }
    std::vector<int32_t> selected;
    for (const auto& [p, s] : best_score) {
        if (s >= min_ungapped_score) selected.push_back(p);
    }
    std::sort(selected.begin(), selected.end());
    int64_t n = std::min<int64_t>(selected.size(), max_out);
    std::copy(selected.begin(), selected.begin() + n, out_profiles);
    return n;
}

// Batched, multithreaded driver: runs prefilter_query over n_queries
// concatenated queries (CSR layout) with n_threads workers. Outputs are
// written per query into out_profiles[q * max_out_per_query ...] with
// counts in out_counts[q]. Replaces the reference's `--threads` knob for
// this stage (genomad/mmseqs2.py:83).
int64_t prefilter_batch(
    const int64_t* sorted_kmers,
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
    int32_t* out_profiles,           // (n_queries, max_out_per_query)
    int64_t* out_counts,             // (n_queries)
    int64_t max_out_per_query,
    int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        for (;;) {
            int64_t q = next.fetch_add(1);
            if (q >= n_queries) break;
            out_counts[q] = prefilter_query(
                sorted_kmers, entry_profiles, entry_positions, n_entries,
                query_codes + code_offsets[q],
                code_offsets[q + 1] - code_offsets[q],
                residues + residue_offsets[q],
                residue_offsets[q + 1] - residue_offsets[q],
                pssm, offsets, lengths, min_ungapped_score,
                out_profiles + q * max_out_per_query, max_out_per_query);
        }
    };
    std::vector<std::thread> threads;
    for (int32_t t = 1; t < n_threads; ++t) threads.emplace_back(worker);
    worker();
    for (auto& t : threads) t.join();
    return n_queries;
}

}  // extern "C"
