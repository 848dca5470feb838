// Native prefilter: query k-mer lookup + ungapped diagonal extension.
//
// C++ counterpart of genomad_tpu.ops.protein_search.prefilter_query — the
// host-side stage that replaces MMseqs2's C++ prefilter (reference chain:
// genomad/mmseqs2.py:76-96, `mmseqs prefilter -k 5 --min-ungapped-score 25`).
// The device-side alignment stays in JAX; this stage is pure CPU and
// latency-bound, hence native.
//
// Algorithm (identical to the numpy implementation):
//   1. look up each query 5-mer code (and, with a substitution matrix +
//      threshold, its similar-k-mer expansion) in the direct offset table
//      over the 20^5 code space — one load per k-mer, no binary search;
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

// Open-addressed (profile, diag) -> hit count map with linear probing.
// Key = packed uint64 (profile << 32 | uint32(diag)); EMPTY sentinel =
// all-ones (an impossible profile id). Node-based std::unordered_map costs
// one malloc per unique key — with similar-k-mer expansion a query can
// touch ~10^6 diagonals, and those allocations dominated the prefilter.
class DiagCounts {
  public:
    explicit DiagCounts(size_t initial = 1 << 16) { rehash(initial); }

    void insert(int32_t profile, int32_t diag) {
        uint64_t key = (static_cast<uint64_t>(static_cast<uint32_t>(profile))
                        << 32) |
                       static_cast<uint32_t>(diag);
        if ((count_ + 1) * 10 > capacity_ * 7) rehash(capacity_ * 2);
        size_t slot = probe(key);
        if (keys_[slot] == kEmpty) {
            keys_[slot] = key;
            hits_[slot] = 1;
            ++count_;
        } else if (hits_[slot] < 255) {
            ++hits_[slot];
        }
    }

    template <typename Fn>
    void for_each(uint8_t min_hits, Fn fn) const {
        for (size_t slot = 0; slot < capacity_; ++slot) {
            if (keys_[slot] == kEmpty || hits_[slot] < min_hits) continue;
            uint64_t key = keys_[slot];
            fn(static_cast<int32_t>(key >> 32),
               static_cast<int32_t>(static_cast<uint32_t>(key)));
        }
    }

  private:
    static constexpr uint64_t kEmpty = ~uint64_t{0};

    size_t probe(uint64_t key) const {
        size_t slot = (key * 0x9E3779B97F4A7C15ull) & (capacity_ - 1);
        while (keys_[slot] != kEmpty && keys_[slot] != key)
            slot = (slot + 1) & (capacity_ - 1);
        return slot;
    }

    void rehash(size_t capacity) {
        std::vector<uint64_t> old_k = std::move(keys_);
        std::vector<uint8_t> old_h = std::move(hits_);
        capacity_ = capacity;
        keys_.assign(capacity_, kEmpty);
        hits_.assign(capacity_, 0);
        for (size_t i = 0; i < old_k.size(); ++i) {
            if (old_k[i] == kEmpty) continue;
            size_t slot = probe(old_k[i]);
            keys_[slot] = old_k[i];
            hits_[slot] = old_h[i];
        }
    }

    std::vector<uint64_t> keys_;
    std::vector<uint8_t> hits_;
    size_t capacity_ = 0;
    size_t count_ = 0;
};

}  // namespace

extern "C" {

// Returns the TOTAL number of selected profiles (min(total, max_out) are
// written to out_profiles; the caller logs total - written as dropped,
// never silently). Inputs:
//   code_table: (20^5 + 1) int32 offsets — entries of code c are
//     [code_table[c], code_table[c+1]) in entry_profiles/entry_positions
//   query_codes: Lq-k+1 k-mer codes (-1 = invalid)
//   residues: Lq int8 residue indices (20 = unknown)
//   pssm: flat (total_positions, 20) float32
//   offsets: (P+1) int64 row offsets into pssm
//   lengths: (P) int32 profile lengths
//   subst/kmer_thr: 20x20 substitution matrix + similar-k-mer score
//     threshold for query-side k-mer expansion (MMseqs2 ``-s`` semantics);
//     subst == nullptr or kmer_thr >= 1e30 disables expansion (exact
//     k-mers only). Mirrors genomad_tpu.ops.blosum.similar_kmers.
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
    int64_t max_out) {
    constexpr int K = 5;
    const bool expand = subst != nullptr && kmer_thr < 1e30f;
    // per-residue substitution lists sorted by score descending (for the
    // branch-and-bound expansion DFS)
    float sub_score[20][20];
    int8_t sub_res[20][20];
    if (expand) {
        for (int a = 0; a < 20; ++a) {
            int idx[20];
            for (int x = 0; x < 20; ++x) idx[x] = x;
            std::sort(idx, idx + 20, [&](int u, int v) {
                float su = subst[a * 20 + u], sv = subst[a * 20 + v];
                return su != sv ? su > sv : u < v;
            });
            for (int x = 0; x < 20; ++x) {
                sub_res[a][x] = static_cast<int8_t>(idx[x]);
                sub_score[a][x] = subst[a * 20 + idx[x]];
            }
        }
    }
    // 1-2. k-mer lookups -> unique (profile, diagonal) candidates
    DiagCounts diagonals;
    (void)n_entries;
    auto lookup = [&](int64_t code, int64_t q) {
        for (int32_t e = code_table[code]; e < code_table[code + 1]; ++e) {
            diagonals.insert(entry_profiles[e],
                             static_cast<int32_t>(entry_positions[e] - q));
        }
    };
    for (int64_t q = 0; q < n_codes; ++q) {
        int64_t code = query_codes[q];
        if (code < 0) continue;
        if (!expand) {
            lookup(code, q);
            continue;
        }
        // branch-and-bound DFS over the K window positions: emit every
        // k-mer whose substitution score vs the query window >= kmer_thr
        const int8_t* w = residues + q;
        float suffix_max[K + 1];
        suffix_max[K] = 0.0f;
        for (int i = K - 1; i >= 0; --i)
            suffix_max[i] = suffix_max[i + 1] + sub_score[w[i]][0];
        int choice[K];
        int64_t code_stack[K + 1];
        float score_stack[K + 1];
        code_stack[0] = 0;
        score_stack[0] = 0.0f;
        int pos = 0;
        choice[0] = 0;
        while (pos >= 0) {
            if (choice[pos] >= 20) {
                --pos;
                if (pos >= 0) ++choice[pos];
                continue;
            }
            int a = w[pos];
            float s = sub_score[a][choice[pos]];
            if (score_stack[pos] + s + suffix_max[pos + 1] < kmer_thr) {
                // score-sorted: every later residue at this level fails too
                --pos;
                if (pos >= 0) ++choice[pos];
                continue;
            }
            int64_t next_code = code_stack[pos] * 20 + sub_res[a][choice[pos]];
            float next_score = score_stack[pos] + s;
            if (pos == K - 1) {
                lookup(next_code, q);
                ++choice[pos];
            } else {
                code_stack[pos + 1] = next_code;
                score_stack[pos + 1] = next_score;
                ++pos;
                choice[pos] = 0;
            }
        }
    }
    // 3-4. ungapped extension per candidate diagonal; best score per profile.
    // In expansion mode a diagonal must collect >= 2 k-mer hits before the
    // Kadane extension runs — MMseqs2's double-k-mer-match criterion, which
    // suppresses the single-hit noise diagonals that similar-k-mer lists
    // generate in bulk (a true homology diagonal accumulates many hits).
    const uint8_t min_hits = expand ? 2 : 1;
    std::unordered_map<int32_t, float> best_score;
    diagonals.for_each(min_hits, [&](int32_t p, int32_t diag) {
        int64_t p_len = lengths[p];
        int64_t q_start = diag < 0 ? -diag : 0;
        int64_t p_start = diag > 0 ? diag : 0;
        int64_t overlap =
            std::min(query_length - q_start, p_len - p_start);
        if (overlap <= 0) return;
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
    });
    std::vector<int32_t> selected;
    for (const auto& [p, s] : best_score) {
        if (s >= min_ungapped_score) selected.push_back(p);
    }
    // When over capacity keep the best-scoring profiles (the caller logs the
    // drop count — out-of-capacity truncation is reported, never silent).
    if (static_cast<int64_t>(selected.size()) > max_out) {
        std::sort(selected.begin(), selected.end(),
                  [&](int32_t a, int32_t b) {
                      float sa = best_score[a], sb = best_score[b];
                      return sa != sb ? sa > sb : a < b;
                  });
        std::sort(selected.begin(), selected.begin() + max_out);
        std::copy(selected.begin(), selected.begin() + max_out, out_profiles);
    } else {
        std::sort(selected.begin(), selected.end());
        std::copy(selected.begin(), selected.end(), out_profiles);
    }
    return static_cast<int64_t>(selected.size());
}

// Batched, multithreaded driver: runs prefilter_query over n_queries
// concatenated queries (CSR layout) with n_threads workers. Outputs are
// written per query into out_profiles[q * max_out_per_query ...] with
// TOTAL (uncapped) selection counts in out_counts[q] — the caller clamps
// and logs any excess as dropped. Replaces the reference's `--threads`
// knob for this stage (genomad/mmseqs2.py:83).
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
                code_table, entry_profiles, entry_positions, n_entries,
                query_codes + code_offsets[q],
                code_offsets[q + 1] - code_offsets[q],
                residues + residue_offsets[q],
                residue_offsets[q + 1] - residue_offsets[q],
                pssm, offsets, lengths, min_ungapped_score, subst, kmer_thr,
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
