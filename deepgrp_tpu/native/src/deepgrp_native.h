/* deepgrp_tpu native host library.
 *
 * C ABI for the host-side hot paths of deepgrp_tpu:
 *   - Ruzzo–Tompa all-maximal-scoring-subsequences with X-drop reset and
 *     majority-vote segment labeling (behavioral parity with the reference's
 *     /root/reference/deepgrp/_mss/mss.c + _mss/pymss.pyx — re-implemented
 *     from the algorithm, not copied),
 *   - ASCII DNA -> one-hot encoding with N trimming (parity with
 *     /root/reference/deepgrp/sequence.pyx:21-36),
 *   - strided overlap-max merge host fallback (parity with
 *     /root/reference/deepgrp/maxcalc.c:10-24; the production path is an
 *     on-device XLA shifted-max, this is used for oracle tests and
 *     host-only runs).
 */
#ifndef DEEPGRP_TPU_NATIVE_H_
#define DEEPGRP_TPU_NATIVE_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  int64_t start;
  int64_t end; /* exclusive */
  double score;
} DgSegment;

/* Find all maximal scoring subsequences of `scores[0..n)`.
 * Segments with score >= trunc(min_score) are reported (the truncation of
 * min_score to an integer mirrors the reference's implicit double->int
 * conversion at mss.c:35/79 and is required for bit parity).
 * An X-drop reset occurs when xdrop > 0 and the running prefix falls more
 * than `xdrop` below the running maximum (mss.c:89-92 semantics).
 *
 * Writes up to `capacity` segments into `out`; returns the total number of
 * segments found (which may exceed capacity; call again with a larger
 * buffer in that case). */
int64_t dg_mss_find_all(const double *scores, int64_t n, double min_score,
                        double xdrop, DgSegment *out, int64_t capacity);

/* Reference-parity MSS labeling (pymss.pyx:31-80):
 * score transform constants s0 = log(0.99/0.01), min_sc = s0*min_mss_len,
 * xdrop = s0*xdrop_len*10 (or -1 when xdrop_len <= 0); per found segment the
 * majority label over classes 1..n_labels-1 is assigned to in-segment
 * positions whose own label is 0, labeled positions keep their own label,
 * and positions outside every segment keep their raw label.  Writes a
 * one-hot [n, n_labels] row-major array of doubles into `one_hot_out`
 * (caller must pass zero-initialized memory). */
void dg_find_mss_labels(const double *scores, const int64_t *labels,
                        int64_t n, int32_t n_labels, int32_t min_mss_len,
                        int32_t xdrop_len, double *one_hot_out);

/* Exact multithreaded variants (see mss_parallel.cc for the reset-point
 * block-decomposition argument; outputs are identical to the sequential
 * functions for every input). */
int64_t dg_mss_find_all_mt(const double *scores, int64_t n, double min_score,
                           double xdrop, int32_t n_threads, DgSegment *out,
                           int64_t capacity);
void dg_find_mss_labels_mt(const double *scores, const int64_t *labels,
                           int64_t n, int32_t n_labels, int32_t min_mss_len,
                           int32_t xdrop_len, int32_t n_threads,
                           double *one_hot_out);

/* As dg_find_mss_labels_mt but writes the class id per position (the
 * argmax of the one-hot row) into `classes_out` [n], skipping the one-hot
 * intermediate.  `classes_out` need not be initialized. */
void dg_find_mss_classes_mt(const double *scores, const int64_t *labels,
                            int64_t n, int32_t n_labels, int32_t min_mss_len,
                            int32_t xdrop_len, int32_t n_threads,
                            int32_t *classes_out);

/* Number of leading (from `*start`) and trailing (before `*end`) 'N' bytes
 * trimmed: on return [*start, *end) is the kept range of seq[0..n). */
void dg_trim_n(const char *seq, int64_t n, int64_t *start, int64_t *end);

/* One-hot encode seq[0..n) into out[5][n] (row-major, row stride n):
 * A->0 C->1 G->2 T->3, everything else (incl. 'N', lowercase handled) -> 4.
 * `out` must be zero-initialized by the caller; ones are written. */
void dg_one_hot_encode(const char *seq, int64_t n, int8_t *out);

/* Strided overlap max merge: for each window b of inputs[batch][dim0][dim1],
 * output[b*stride + i][j] = max(output[...], inputs[b][i][j]).
 * `output` must be large enough: (batch-1)*stride + dim0 rows. */
void dg_overlap_max(float *output, const float *inputs, size_t dim0,
                    size_t dim1, size_t stride, size_t batch);

#ifdef __cplusplus
}
#endif

#endif /* DEEPGRP_TPU_NATIVE_H_ */
