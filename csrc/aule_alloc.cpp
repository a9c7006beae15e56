// Native page allocator + sequence/block-table bookkeeping for the
// aule-tpu serving layer.
//
// TPU-native counterpart of the reference's Zig BlockPool / BlockTable
// (src/block_pool.zig, src/block_table.zig): the device-side data lives in
// JAX arrays, but the host-side bookkeeping (free lists, per-sequence page
// lists, batch-view construction) sits on the serving hot path — every
// decode step builds [B, max_pages] tables — so it is implemented in C++
// and exposed over a minimal C ABI (ctypes; no pybind11 in this image).
// Python fallback: aule_tpu/serving/kv_cache.py::PythonPageAllocator.
//
// Behavioral contract matches the Python implementation exactly (tested
// against it in tests/test_native_alloc.py):
//   * LIFO free list, pages 0..num_pages-1 initially free in order
//     (first allocate(1) returns page 0);
//   * grow() preserves allocations and appends new pages;
//   * allocate() fails atomically (no partial allocation) when short.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Allocator {
  std::vector<int32_t> free_list;  // back = next page handed out
  int32_t num_pages = 0;
};

struct SeqState {
  std::vector<int32_t> pages;
  int64_t len = 0;
};

struct SeqManager {
  Allocator* alloc = nullptr;
  int32_t page_size = 0;
  int32_t max_pages_per_seq = 0;
  std::unordered_map<int64_t, SeqState> seqs;
};

}  // namespace

extern "C" {

void* aule_alloc_create(int32_t num_pages) {
  auto* a = new Allocator();
  a->num_pages = num_pages;
  a->free_list.reserve(num_pages);
  for (int32_t p = num_pages - 1; p >= 0; --p) a->free_list.push_back(p);
  return a;
}

void aule_alloc_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t aule_alloc_num_free(void* h) {
  return static_cast<int32_t>(static_cast<Allocator*>(h)->free_list.size());
}

int32_t aule_alloc_num_pages(void* h) {
  return static_cast<Allocator*>(h)->num_pages;
}

// Returns 0 on success (out_pages filled with n page ids), -1 if exhausted.
int32_t aule_alloc_allocate(void* h, int32_t n, int32_t* out_pages) {
  auto* a = static_cast<Allocator*>(h);
  if (n < 0 || static_cast<size_t>(n) > a->free_list.size()) return -1;
  for (int32_t i = 0; i < n; ++i) {
    out_pages[i] = a->free_list.back();
    a->free_list.pop_back();
  }
  return 0;
}

void aule_alloc_free(void* h, int32_t n, const int32_t* pages) {
  auto* a = static_cast<Allocator*>(h);
  a->free_list.insert(a->free_list.end(), pages, pages + n);
}

// Copy the free list into out (caller sizes it via aule_alloc_num_free);
// used by serving checkpoint/resume.
void aule_alloc_get_free(void* h, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::copy(a->free_list.begin(), a->free_list.end(), out);
}

// Replace the free list wholesale (checkpoint restore).
void aule_alloc_set_free(void* h, int32_t n, const int32_t* pages) {
  auto* a = static_cast<Allocator*>(h);
  a->free_list.assign(pages, pages + n);
}

// Grow to new_num_pages (must be >= current); new pages become free.
int32_t aule_alloc_grow(void* h, int32_t new_num_pages) {
  auto* a = static_cast<Allocator*>(h);
  if (new_num_pages < a->num_pages) return -1;
  for (int32_t p = new_num_pages - 1; p >= a->num_pages; --p)
    a->free_list.push_back(p);
  a->num_pages = new_num_pages;
  return 0;
}

// ---- sequence manager -----------------------------------------------------

void* aule_seqs_create(void* alloc, int32_t page_size,
                       int32_t max_pages_per_seq) {
  auto* m = new SeqManager();
  m->alloc = static_cast<Allocator*>(alloc);
  m->page_size = page_size;
  m->max_pages_per_seq = max_pages_per_seq;
  return m;
}

void aule_seqs_destroy(void* h) { delete static_cast<SeqManager*>(h); }

int32_t aule_seq_add(void* h, int64_t seq_id) {
  auto* m = static_cast<SeqManager*>(h);
  if (m->seqs.count(seq_id)) return -1;
  m->seqs[seq_id] = SeqState{};
  return 0;
}

// Ensure pages for num_new_tokens more tokens.
// 0 ok; -1 pool exhausted; -2 exceeds max_pages_per_seq; -3 unknown seq.
int32_t aule_seq_reserve(void* h, int64_t seq_id, int64_t num_new_tokens) {
  auto* m = static_cast<SeqManager*>(h);
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -3;
  SeqState& s = it->second;
  int64_t need = (s.len + num_new_tokens + m->page_size - 1) / m->page_size;
  int64_t extra = need - static_cast<int64_t>(s.pages.size());
  if (extra <= 0) return 0;
  if (need > m->max_pages_per_seq) return -2;
  if (extra > static_cast<int64_t>(m->alloc->free_list.size())) return -1;
  size_t base = s.pages.size();
  s.pages.resize(base + extra);
  aule_alloc_allocate(m->alloc, static_cast<int32_t>(extra),
                      s.pages.data() + base);
  return 0;
}

int32_t aule_seq_advance(void* h, int64_t seq_id, int64_t tokens) {
  auto* m = static_cast<SeqManager*>(h);
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -3;
  it->second.len += tokens;
  return 0;
}

int64_t aule_seq_len(void* h, int64_t seq_id) {
  auto* m = static_cast<SeqManager*>(h);
  auto it = m->seqs.find(seq_id);
  return it == m->seqs.end() ? -1 : it->second.len;
}

int32_t aule_seq_remove(void* h, int64_t seq_id) {
  auto* m = static_cast<SeqManager*>(h);
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -3;
  aule_alloc_free(m->alloc, static_cast<int32_t>(it->second.pages.size()),
                  it->second.pages.data());
  m->seqs.erase(it);
  return 0;
}

// Fill bt_out [batch, max_pages] (-1 padded) and lens_out [batch] for the
// given sequences — the per-decode-step hot path.
int32_t aule_build_batch_views(void* h, const int64_t* seq_ids,
                               int32_t batch, int32_t max_pages,
                               int32_t* bt_out, int32_t* lens_out) {
  auto* m = static_cast<SeqManager*>(h);
  for (int32_t b = 0; b < batch; ++b) {
    int32_t* row = bt_out + static_cast<int64_t>(b) * max_pages;
    auto it = m->seqs.find(seq_ids[b]);
    if (it == m->seqs.end()) {
      std::memset(row, 0xFF, sizeof(int32_t) * max_pages);  // all -1
      lens_out[b] = 0;
      continue;
    }
    const SeqState& s = it->second;
    int32_t n = static_cast<int32_t>(s.pages.size());
    if (n > max_pages) return -1;
    std::memcpy(row, s.pages.data(), sizeof(int32_t) * n);
    std::memset(row + n, 0xFF, sizeof(int32_t) * (max_pages - n));
    lens_out[b] = static_cast<int32_t>(s.len);
  }
  return 0;
}

}  // extern "C"
