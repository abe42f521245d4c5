// Flat inner-product similarity index — native replacement for the faiss
// IndexIDMap(IndexFlatIP) surface used by the replay buffer
// (/root/reference/datasets/replay_buffer.py:395-445,484-500):
//   add_with_ids, search(k), remove_ids, reconstruct, ntotal, id map,
//   plus a pairwise-similarity helper for the eviction rule.
//
// The buffer holds <= a few hundred vectors of dim 512-2048, so exact
// brute force is both sufficient and bit-stable. Row storage is
// contiguous; removals compact in place.
//
// Build: make (g++ -O3 -march=native -shared -fPIC). Exposed via ctypes —
// plain C ABI, no pybind11.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

struct SimIndex {
  int64_t dim;
  std::vector<float> data;    // n x dim, row-major
  std::vector<int64_t> ids;   // n

  int64_t size() const { return static_cast<int64_t>(ids.size()); }

  const float* row(int64_t i) const { return data.data() + i * dim; }
};

inline float dot(const float* a, const float* b, int64_t dim) {
  float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
  int64_t i = 0;
  for (; i + 4 <= dim; i += 4) {
    acc0 += a[i] * b[i];
    acc1 += a[i + 1] * b[i + 1];
    acc2 += a[i + 2] * b[i + 2];
    acc3 += a[i + 3] * b[i + 3];
  }
  for (; i < dim; ++i) acc0 += a[i] * b[i];
  return acc0 + acc1 + acc2 + acc3;
}

}  // namespace

extern "C" {

void* simindex_create(int64_t dim) {
  auto* index = new SimIndex();
  index->dim = dim;
  return index;
}

void simindex_free(void* handle) {
  delete static_cast<SimIndex*>(handle);
}

int64_t simindex_size(void* handle) {
  return static_cast<SimIndex*>(handle)->size();
}

int64_t simindex_dim(void* handle) {
  return static_cast<SimIndex*>(handle)->dim;
}

void simindex_add_with_ids(void* handle, int64_t n, const int64_t* ids,
                           const float* vectors) {
  auto* index = static_cast<SimIndex*>(handle);
  index->data.insert(index->data.end(), vectors,
                     vectors + n * index->dim);
  index->ids.insert(index->ids.end(), ids, ids + n);
}

// Top-k inner-product search. Returns scores descending; absent slots get
// id -1 and score -inf (faiss convention).
void simindex_search(void* handle, int64_t nq, const float* queries,
                     int64_t k, float* out_scores, int64_t* out_ids) {
  auto* index = static_cast<SimIndex*>(handle);
  const int64_t n = index->size();
  std::vector<std::pair<float, int64_t>> scored(n);
  for (int64_t q = 0; q < nq; ++q) {
    const float* query = queries + q * index->dim;
    for (int64_t i = 0; i < n; ++i) {
      scored[i] = {dot(query, index->row(i), index->dim), index->ids[i]};
    }
    const int64_t kk = std::min(k, n);
    // NaN-aware comparator: plain `a > b` violates strict weak
    // ordering when scores are NaN (diverged-model feature vectors),
    // which is UB in partial_sort. NaNs sort after every number.
    std::partial_sort(scored.begin(), scored.begin() + kk, scored.end(),
                      [](const auto& a, const auto& b) {
                        const bool an = std::isnan(a.first);
                        const bool bn = std::isnan(b.first);
                        if (an || bn) return bn && !an;
                        return a.first > b.first;
                      });
    for (int64_t j = 0; j < k; ++j) {
      if (j < kk) {
        out_scores[q * k + j] = scored[j].first;
        out_ids[q * k + j] = scored[j].second;
      } else {
        out_scores[q * k + j] = -std::numeric_limits<float>::infinity();
        out_ids[q * k + j] = -1;
      }
    }
  }
}

int64_t simindex_remove_ids(void* handle, int64_t n, const int64_t* ids) {
  auto* index = static_cast<SimIndex*>(handle);
  // Remove EVERY row whose id matches — faiss remove_ids and the numpy
  // fallback's isin() semantics (first-match-only would leave stale
  // duplicates in this backend but not the other). Stable single-pass
  // compaction preserves insertion order.
  int64_t write = 0;
  int64_t removed = 0;
  const int64_t total = index->size();
  for (int64_t i = 0; i < total; ++i) {
    bool match = false;
    for (int64_t j = 0; j < n; ++j) {
      if (index->ids[i] == ids[j]) { match = true; break; }
    }
    if (match) { ++removed; continue; }
    if (write != i) {
      index->ids[write] = index->ids[i];
      std::memmove(index->data.data() + write * index->dim,
                   index->data.data() + i * index->dim,
                   index->dim * sizeof(float));
    }
    ++write;
  }
  index->ids.resize(write);
  index->data.resize(write * index->dim);
  return removed;
}

// Copy the vector with external id `id` into out; returns 0 on success.
int simindex_reconstruct(void* handle, int64_t id, float* out) {
  auto* index = static_cast<SimIndex*>(handle);
  for (int64_t i = 0; i < index->size(); ++i) {
    if (index->ids[i] == id) {
      std::memcpy(out, index->row(i), index->dim * sizeof(float));
      return 0;
    }
  }
  return -1;
}

// Dump all ids and vectors in insertion order.
void simindex_dump(void* handle, int64_t* out_ids, float* out_vectors) {
  auto* index = static_cast<SimIndex*>(handle);
  std::memcpy(out_ids, index->ids.data(), index->size() * sizeof(int64_t));
  std::memcpy(out_vectors, index->data.data(),
              index->data.size() * sizeof(float));
}

// Pairwise similarity matrix S[i, j] = <v_i, v_j> over all stored rows
// (row order = insertion order). Used by the diversity-eviction rule.
void simindex_pairwise(void* handle, float* out) {
  auto* index = static_cast<SimIndex*>(handle);
  const int64_t n = index->size();
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = i; j < n; ++j) {
      const float s = dot(index->row(i), index->row(j), index->dim);
      out[i * n + j] = s;
      out[j * n + i] = s;
    }
  }
}

}  // extern "C"
