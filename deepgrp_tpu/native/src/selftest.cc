// Standalone self-test for the native library, intended to run under
// ASAN/UBSAN (see native/Makefile).  Exercises randomized MSS inputs
// (sequential vs multithreaded equality), the labeling path, encoding and
// the overlap-max fallback; exits non-zero on any mismatch.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include "deepgrp_native.h"

namespace {

int failures = 0;

void Check(bool ok, const char *what) {
  if (!ok) {
    std::fprintf(stderr, "FAIL: %s\n", what);
    ++failures;
  }
}

void TestMssStVsMt(uint64_t seed, int64_t n, double positive_rate) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unit(0.0, 1.0);
  const double s0 = std::log(0.99 / 0.01);
  std::vector<double> scores(n);
  for (int64_t i = 0; i < n; ++i) {
    double t = 0.1 + unit(rng) * (s0 - 0.1);
    scores[i] = unit(rng) < positive_rate ? t : -10.0 * t;
  }
  const double min_sc = s0 * 50;
  const double xdrop = s0 * 50 * 10;
  std::vector<DgSegment> st(n / 2 + 1), mt(n / 2 + 1);
  int64_t n_st = dg_mss_find_all(scores.data(), n, min_sc, xdrop, st.data(),
                                 static_cast<int64_t>(st.size()));
  for (int threads : {2, 3, 8}) {
    int64_t n_mt = dg_mss_find_all_mt(scores.data(), n, min_sc, xdrop,
                                      threads, mt.data(),
                                      static_cast<int64_t>(mt.size()));
    Check(n_st == n_mt, "mt segment count");
    for (int64_t i = 0; i < n_st && i < n_mt; ++i) {
      Check(st[i].start == mt[i].start && st[i].end == mt[i].end &&
                st[i].score == mt[i].score,
            "mt segment equality");
    }
  }
}

void TestLabels() {
  const int64_t n = 1 << 15;
  std::mt19937_64 rng(7);
  std::uniform_real_distribution<double> unit(0.0, 1.0);
  const double s0 = std::log(0.99 / 0.01);
  std::vector<double> scores(n);
  std::vector<int64_t> labels(n);
  for (int64_t i = 0; i < n; ++i) {
    double t = 0.1 + unit(rng) * (s0 - 0.1);
    scores[i] = unit(rng) < 0.3 ? t : -10.0 * t;
    labels[i] = static_cast<int64_t>(unit(rng) * 5);
  }
  std::vector<double> a(n * 5, 0.0), b(n * 5, 0.0);
  dg_find_mss_labels(scores.data(), labels.data(), n, 5, 50, 50, a.data());
  dg_find_mss_labels_mt(scores.data(), labels.data(), n, 5, 50, 50, 8,
                        b.data());
  Check(std::memcmp(a.data(), b.data(), sizeof(double) * a.size()) == 0,
        "labels st vs mt");
  for (int64_t i = 0; i < n; ++i) {
    double row = 0;
    for (int c = 0; c < 5; ++c) row += a[i * 5 + c];
    Check(row == 1.0, "labels one-hot row");
  }
  // Direct class output == argmax of the one-hot rows.
  std::vector<int32_t> cls(n, -1);
  dg_find_mss_classes_mt(scores.data(), labels.data(), n, 5, 50, 50, 8,
                         cls.data());
  for (int64_t i = 0; i < n; ++i) {
    int32_t argmax = 0;
    for (int c = 1; c < 5; ++c) {
      if (a[i * 5 + c] > a[i * 5 + argmax]) argmax = c;
    }
    Check(cls[i] == argmax, "classes == one-hot argmax");
  }
}

void TestEncode() {
  const char *seq = "NNACGTXacgtNN";
  int64_t start = 0, end = 0;
  dg_trim_n(seq, static_cast<int64_t>(std::strlen(seq)), &start, &end);
  Check(start == 2 && end == 11, "trim bounds");
  const int64_t len = end - start;
  std::vector<int8_t> out(5 * len, 0);
  dg_one_hot_encode(seq + start, len, out.data());
  for (int64_t i = 0; i < len; ++i) {
    int sum = 0;
    for (int r = 0; r < 5; ++r) sum += out[r * len + i];
    Check(sum == 1, "one-hot column");
  }
  Check(out[0 * len + 0] == 1, "A channel");
  Check(out[4 * len + 4] == 1, "X -> N channel");
}

void TestOverlapMax() {
  const size_t batch = 4, dim0 = 6, dim1 = 3, stride = 2;
  std::vector<float> in(batch * dim0 * dim1);
  for (size_t i = 0; i < in.size(); ++i) in[i] = static_cast<float>(i % 17);
  std::vector<float> out((batch - 1) * stride + dim0 + 2, 0.0f);
  std::vector<float> expect = out;
  out.resize(((batch - 1) * stride + dim0) * dim1, 0.0f);
  expect = out;
  dg_overlap_max(out.data(), in.data(), dim0, dim1, stride, batch);
  for (size_t b = 0; b < batch; ++b) {
    for (size_t i = 0; i < dim0 * dim1; ++i) {
      size_t pos = b * stride * dim1 + i;
      if (in[b * dim0 * dim1 + i] > expect[pos])
        expect[pos] = in[b * dim0 * dim1 + i];
    }
  }
  Check(std::memcmp(out.data(), expect.data(),
                    sizeof(float) * out.size()) == 0,
        "overlap max");
}

}  // namespace

int main() {
  for (uint64_t seed : {1u, 2u, 3u}) {
    TestMssStVsMt(seed, 1 << 18, 0.3);
    TestMssStVsMt(seed + 100, 1 << 16, 0.05);
    TestMssStVsMt(seed + 200, 1 << 16, 0.9);
  }
  TestLabels();
  TestEncode();
  TestOverlapMax();
  if (failures) {
    std::fprintf(stderr, "%d failures\n", failures);
    return 1;
  }
  std::printf("native selftest OK\n");
  return 0;
}
