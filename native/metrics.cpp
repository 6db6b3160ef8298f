// Native evaluation kernels for pctrans_tpu.
//
// C++ equivalent of the reference's Cython metrics module
// (lib/evaluate/CVPPP_evaluate.pyx): BestDice / SymmetricBestDice /
// DiffFGLabels.  Where the reference computes each label-pair dice with a
// full-image pass (O(n_in * n_gt * H * W)), this builds one joint
// contingency table in a single O(H * W) pass and reduces it.
//
// Exposed as a plain C ABI consumed via ctypes
// (pctrans_tpu/inference/native.py); no pybind11 dependency.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Joint histogram of (a, b) label pairs.  a, b: int32 arrays of length n,
// values in [0, n_a) / [0, n_b).  out: int64 array of n_a * n_b zeros.
void contingency_i32(const int32_t* a, const int32_t* b, int64_t n,
                     int64_t n_a, int64_t n_b, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[(int64_t)a[i] * n_b + b[i]] += 1;
  }
}

// BestDice over a contingency table.
// joint: [n_in x n_gt] row-major int64; min/max label values delimit the
// foreground ranges exactly as the reference does (absent intermediate
// labels count 0 in the mean).
double best_dice_from_joint(const int64_t* joint, int64_t n_in, int64_t n_gt,
                            int64_t min_in, int64_t max_in,
                            int64_t min_gt, int64_t max_gt) {
  if (max_in == min_in) return 0.0;
  std::vector<double> size_in(n_in, 0.0), size_gt(n_gt, 0.0);
  for (int64_t i = 0; i < n_in; ++i)
    for (int64_t j = 0; j < n_gt; ++j) {
      double v = (double)joint[i * n_gt + j];
      size_in[i] += v;
      size_gt[j] += v;
    }
  double score = 0.0;
  for (int64_t i = min_in + 1; i <= max_in; ++i) {
    double best = 0.0;
    for (int64_t j = min_gt + 1; j <= max_gt; ++j) {
      double denom = size_in[i] + size_gt[j];
      if (denom > 1e-8) {
        double d = 2.0 * (double)joint[i * n_gt + j] / denom;
        if (d > best) best = d;
      }
    }
    score += best;
  }
  return score / (double)(max_in - min_in);
}

// One-shot SymmetricBestDice on int32 label maps (n pixels).
// Returns min(BD(in,gt), BD(gt,in)); writes both directions to bd_out[2].
double symmetric_best_dice_i32(const int32_t* in_label, const int32_t* gt_label,
                               int64_t n, double* bd_out) {
  int32_t max_in = 0, min_in = in_label[0], max_gt = 0, min_gt = gt_label[0];
  for (int64_t i = 0; i < n; ++i) {
    max_in = std::max(max_in, in_label[i]);
    min_in = std::min(min_in, in_label[i]);
    max_gt = std::max(max_gt, gt_label[i]);
    min_gt = std::min(min_gt, gt_label[i]);
  }
  int64_t n_in = (int64_t)max_in + 1, n_gt = (int64_t)max_gt + 1;
  std::vector<int64_t> joint(n_in * n_gt, 0);
  contingency_i32(in_label, gt_label, n, n_in, n_gt, joint.data());

  double bd1 = best_dice_from_joint(joint.data(), n_in, n_gt,
                                    min_in, max_in, min_gt, max_gt);
  // transpose view for the other direction
  std::vector<int64_t> jt(n_gt * n_in, 0);
  for (int64_t i = 0; i < n_in; ++i)
    for (int64_t j = 0; j < n_gt; ++j) jt[j * n_in + i] = joint[i * n_gt + j];
  double bd2 = best_dice_from_joint(jt.data(), n_gt, n_in,
                                    min_gt, max_gt, min_in, max_in);
  if (bd_out) { bd_out[0] = bd1; bd_out[1] = bd2; }
  return bd1 < bd2 ? bd1 : bd2;
}

// DiffFGLabels: (max(in)-min(in)) - (max(gt)-min(gt)).
double diff_fg_labels_i32(const int32_t* in_label, const int32_t* gt_label,
                          int64_t n) {
  int32_t max_in = in_label[0], min_in = in_label[0];
  int32_t max_gt = gt_label[0], min_gt = gt_label[0];
  for (int64_t i = 0; i < n; ++i) {
    max_in = std::max(max_in, in_label[i]);
    min_in = std::min(min_in, in_label[i]);
    max_gt = std::max(max_gt, gt_label[i]);
    min_gt = std::min(min_gt, gt_label[i]);
  }
  return (double)(max_in - min_in) - (double)(max_gt - min_gt);
}

// Pairwise dice of binary masks for the postprocess clustering
// (maskformer.py:392-401 semantics): masks [n x hw] uint8 row-major;
// out [n x n] double gets (2*|i&j| + 1) / (|i| + |j| + 1).
void pairwise_dice_u8(const uint8_t* masks, int64_t n, int64_t hw,
                      double* out) {
  std::vector<double> sums(n, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* mi = masks + i * hw;
    double s = 0.0;
    for (int64_t k = 0; k < hw; ++k) s += mi[k];
    sums[i] = s;
  }
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* mi = masks + i * hw;
    out[i * n + i] = (2.0 * sums[i] + 1.0) / (2.0 * sums[i] + 1.0);
    for (int64_t j = i + 1; j < n; ++j) {
      const uint8_t* mj = masks + j * hw;
      double inter = 0.0;
      for (int64_t k = 0; k < hw; ++k) inter += (double)(mi[k] & mj[k]);
      double d = (2.0 * inter + 1.0) / (sums[i] + sums[j] + 1.0);
      out[i * n + j] = d;
      out[j * n + i] = d;
    }
  }
}

}  // extern "C"
