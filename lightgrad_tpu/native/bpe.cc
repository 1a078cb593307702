// Native BPE merge core for the GPT-2 byte-level tokenizer.
//
// Symbols are represented by their VOCAB ids: byte-level BPE guarantees
// every initial character and every merged string is itself a vocab entry,
// so the merge table maps an id pair to (rank, merged id) and the whole
// merge loop runs without touching strings.  The table is built once per
// tokenizer behind an integer handle (50k merges -- rebuilding per call
// would dominate).  The Python bridge (native/__init__.py) degrades to the
// pure-Python loop when no toolchain is available.

#include <cstdint>
#include <memory>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct MergeTable {
  // key: (a << 32) | b  ->  (rank, merged_id)
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> ranks;
};

std::mutex g_mu;
std::vector<std::unique_ptr<MergeTable>> g_tables;

inline uint64_t key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

}  // namespace

extern "C" {

// Build a merge table; rank of merge i is i.  Returns a handle (>= 0).
int64_t lg_bpe_new(const int32_t* pair_a, const int32_t* pair_b,
                   const int32_t* merged, int64_t n_merges) {
  auto t = std::make_unique<MergeTable>();
  t->ranks.reserve(static_cast<size_t>(n_merges) * 2);
  for (int64_t i = 0; i < n_merges; ++i) {
    t->ranks.emplace(key(pair_a[i], pair_b[i]),
                     std::make_pair(static_cast<int32_t>(i), merged[i]));
  }
  std::lock_guard<std::mutex> lock(g_mu);
  g_tables.push_back(std::move(t));
  return static_cast<int64_t>(g_tables.size()) - 1;
}

// Greedy BPE: repeatedly merge the lowest-rank adjacent pair (all
// occurrences) until none is mergeable.  word/out are vocab ids; returns
// the merged length (<= n).  out must have capacity n.
int64_t lg_bpe_encode(int64_t handle, const int32_t* word, int64_t n,
                      int32_t* out) {
  const MergeTable* t;
  {
    std::lock_guard<std::mutex> lock(g_mu);
    if (handle < 0 || handle >= static_cast<int64_t>(g_tables.size()))
      return -1;
    t = g_tables[static_cast<size_t>(handle)].get();
  }
  std::vector<int32_t> w(word, word + n);
  while (w.size() > 1) {
    int32_t best_rank = INT32_MAX, best_merged = -1;
    for (size_t i = 0; i + 1 < w.size(); ++i) {
      auto it = t->ranks.find(key(w[i], w[i + 1]));
      if (it != t->ranks.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_merged = it->second.second;
      }
    }
    if (best_merged < 0) break;
    std::vector<int32_t> m;
    m.reserve(w.size());
    for (size_t i = 0; i < w.size();) {
      if (i + 1 < w.size()) {
        auto it = t->ranks.find(key(w[i], w[i + 1]));
        if (it != t->ranks.end() && it->second.first == best_rank) {
          m.push_back(it->second.second);
          i += 2;
          continue;
        }
      }
      m.push_back(w[i]);
      ++i;
    }
    w.swap(m);
  }
  for (size_t i = 0; i < w.size(); ++i) out[i] = w[i];
  return static_cast<int64_t>(w.size());
}

// Batch variant: words arrive flattened (offsets[i]..offsets[i+1]) and the
// merged ids are written back flattened with per-word counts.  One ctypes
// crossing per TEXT instead of per word -- the per-call overhead dominates
// for typical (<24 symbol) words.
int64_t lg_bpe_encode_batch(int64_t handle, const int32_t* flat,
                            const int64_t* offsets, int64_t n_words,
                            int32_t* out, int64_t* out_counts) {
  const MergeTable* t;
  {
    std::lock_guard<std::mutex> lock(g_mu);
    if (handle < 0 || handle >= static_cast<int64_t>(g_tables.size()))
      return -1;
    t = g_tables[static_cast<size_t>(handle)].get();
  }
  int64_t out_pos = 0;
  std::vector<int32_t> w, m;
  for (int64_t wi = 0; wi < n_words; ++wi) {
    w.assign(flat + offsets[wi], flat + offsets[wi + 1]);
    while (w.size() > 1) {
      int32_t best_rank = INT32_MAX;
      for (size_t i = 0; i + 1 < w.size(); ++i) {
        auto it = t->ranks.find(key(w[i], w[i + 1]));
        if (it != t->ranks.end() && it->second.first < best_rank)
          best_rank = it->second.first;
      }
      if (best_rank == INT32_MAX) break;
      m.clear();
      for (size_t i = 0; i < w.size();) {
        if (i + 1 < w.size()) {
          auto it = t->ranks.find(key(w[i], w[i + 1]));
          if (it != t->ranks.end() && it->second.first == best_rank) {
            m.push_back(it->second.second);
            i += 2;
            continue;
          }
        }
        m.push_back(w[i]);
        ++i;
      }
      w.swap(m);
    }
    for (size_t i = 0; i < w.size(); ++i) out[out_pos + i] = w[i];
    out_counts[wi] = static_cast<int64_t>(w.size());
    out_pos += static_cast<int64_t>(w.size());
  }
  return out_pos;
}

}  // extern "C"
