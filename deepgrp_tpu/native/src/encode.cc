// Host-side FASTA one-hot encoding and the strided overlap-max fallback.
//
// Parity targets: /root/reference/deepgrp/sequence.pyx:11-36 (128-entry
// ASCII lookup, leading/trailing-'N' trimming) and
// /root/reference/deepgrp/maxcalc.c:10-24 (strided elementwise max merge).
// Both are fresh implementations; the on-device production merge lives in
// deepgrp_tpu/ops/overlap_max.py.

#include <cstdint>
#include <cstring>

#include "deepgrp_native.h"

namespace {

// A->0 C->1 G->2 T->3 (either case), everything else -> 4.
constexpr int8_t CodeFor(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return 4;
  }
}

struct CodeTable {
  int8_t code[256];
  constexpr CodeTable() : code() {
    for (int i = 0; i < 256; ++i) code[i] = CodeFor(static_cast<char>(i));
  }
};

constexpr CodeTable kTable;

}  // namespace

extern "C" void dg_trim_n(const char *seq, int64_t n, int64_t *start,
                          int64_t *end) {
  // Only uppercase 'N' is trimmed, matching the reference's byte comparison
  // (sequence.pyx:27-30); callers upper-case FASTA lines first.
  int64_t lo = 0;
  int64_t hi = n;
  while (lo < hi && seq[lo] == 'N') ++lo;
  while (hi > 0 && seq[hi - 1] == 'N') --hi;
  if (hi < lo) hi = lo;
  *start = lo;
  *end = hi;
}

extern "C" void dg_one_hot_encode(const char *seq, int64_t n, int8_t *out) {
  // out is [5][n] row-major, zero-initialized by the caller.
  for (int64_t i = 0; i < n; ++i) {
    const int8_t code = kTable.code[static_cast<uint8_t>(seq[i])];
    out[static_cast<int64_t>(code) * n + i] = 1;
  }
}

extern "C" void dg_overlap_max(float *output, const float *inputs,
                               size_t dim0, size_t dim1, size_t stride,
                               size_t batch) {
  const size_t window = dim0 * dim1;
  const size_t step = stride * dim1;
  for (size_t b = 0; b < batch; ++b) {
    float *dst = output + b * step;
    const float *src = inputs + b * window;
    for (size_t i = 0; i < window; ++i) {
      if (src[i] > dst[i]) dst[i] = src[i];
    }
  }
}
