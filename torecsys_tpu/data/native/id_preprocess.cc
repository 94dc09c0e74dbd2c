// Host-side id-stream preprocessing for the sparse embedding train path.
//
// Per batch, the device-side sparse update needs the fused id stream SORTED
// plus its segment structure (torecsys_tpu/ops/sparse.py
// `update_from_host_aux`).  Computing that on the device costs ~1 ms/step of
// row-granular passes (sort 0.37 ms + prefix/scatter ~0.4 ms on v5e at
// Criteo shapes — SPEED.md); computing it on the HOST overlaps device steps
// entirely.  numpy's argsort measures 5.7 ms per 106k-id batch and holds the
// GIL, capping the input pipeline at ~210 batches/s across 4 threads — below
// the ~260 batches/s the device consumes.  This translation unit does the
// whole thing in ~0.5 ms with the GIL released (ctypes), so a small thread
// pool saturates the device.
//
// Algorithm: LSD radix sort (11-bit digits) of (id << 32 | position) packed
// u64 keys — ids are bounded by num_stored * pack (tens of millions), so 3
// passes cover them — followed by one linear pass emitting sort order,
// in-stored-row slot, stored-row segment index, compact unique stored-row
// ids (sentinel-padded) and the unique count.
//
// No counterpart in the reference: its id streams go straight into
// nn.Embedding under a dense optimizer
// (/root/reference/torecsys/inputs/base/multi_indices_emb.py:103-104).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kDigitBits = 11;
constexpr int kBuckets = 1 << kDigitBits;

// Radix-sorts packed (id << 32 | pos) keys by the id bits; `m` entries.
void radix_sort_ids(std::vector<uint64_t>& a, std::vector<uint64_t>& b,
                    uint32_t max_id) {
  int bits = 1;
  while ((uint64_t{1} << bits) <= max_id && bits < 32) ++bits;
  const int passes = (bits + kDigitBits - 1) / kDigitBits;
  const int64_t m = static_cast<int64_t>(a.size());
  for (int p = 0; p < passes; ++p) {
    const int shift = 32 + p * kDigitBits;  // id lives in the high 32 bits
    int64_t counts[kBuckets] = {0};
    for (int64_t i = 0; i < m; ++i) {
      ++counts[(a[i] >> shift) & (kBuckets - 1)];
    }
    int64_t sum = 0;
    for (int d = 0; d < kBuckets; ++d) {
      int64_t c = counts[d];
      counts[d] = sum;
      sum += c;
    }
    for (int64_t i = 0; i < m; ++i) {
      b[counts[(a[i] >> shift) & (kBuckets - 1)]++] = a[i];
    }
    a.swap(b);
  }
}

}  // namespace

extern "C" {

// Preprocess one batch's fused id stream for the trusted presorted route.
//
//   cats:     (m,) int32 raw slot values, C-order flattened (b * k + k-index)
//   slot_off: (k,) int32 per-slot offsets (position i gets slot_off[i % k]);
//             pass k = 1 with slot_off[0] = 0 for an already-fused stream
//   order:    out (m,) int32 — permutation into ascending-id order
//   lo:       out (m,) int32 — (id % pack) per SORTED position
//   seg:      out (m,) int32 — stored-row segment index per sorted position
//   uids:     out (m,) int32 — compact ascending unique stored-row ids,
//             padded with num_stored
//
// Returns the unique stored-row count (or -1 on bad arguments).
int32_t trs_presort_ids(const int32_t* cats, int64_t m, int32_t k,
                        const int32_t* slot_off, int32_t pack,
                        int32_t num_stored, int32_t* order, int32_t* lo,
                        int32_t* seg, int32_t* uids) {
  if (m <= 0 || k <= 0 || pack <= 0 || num_stored <= 0 || m % k != 0) {
    return -1;
  }
  std::vector<uint64_t> a(m), b(m);
  uint32_t max_id = 0;
  for (int64_t i = 0; i < m; ++i) {
    const uint32_t id =
        static_cast<uint32_t>(cats[i] + slot_off[i % k]);
    if (id > max_id) max_id = id;
    a[i] = (static_cast<uint64_t>(id) << 32) | static_cast<uint32_t>(i);
  }
  radix_sort_ids(a, b, max_id);

  int32_t n_unique = 0;
  int32_t prev_hi = -1;
  for (int64_t i = 0; i < m; ++i) {
    const int32_t id = static_cast<int32_t>(a[i] >> 32);
    order[i] = static_cast<int32_t>(a[i] & 0xFFFFFFFFu);
    const int32_t hi = id / pack;
    lo[i] = id - hi * pack;
    if (hi != prev_hi) {
      uids[n_unique++] = hi;
      prev_hi = hi;
    }
    seg[i] = n_unique - 1;
  }
  for (int64_t i = n_unique; i < m; ++i) uids[i] = num_stored;
  return n_unique;
}

}  // extern "C"
