// Fast COCO detection matching + AP accumulation (host-side C++).
//
// Native counterpart of detectron2's csrc/cocoeval accelerator: the
// O(images * dets * gts * thresholds) greedy matching loop and the
// 101-point precision accumulation, exposed through a plain C ABI for
// ctypes (no pybind11 in this image). Semantics mirror
// spacecraft_pose_estimation_tpu/data/coco_eval.py exactly; the Python
// module uses this library when built and falls back to NumPy otherwise.
//
// Build: make -C native   (produces libcocoeval.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double clamp_pos(double v) { return v > 0 ? v : 0.0; }

double iou(const double* a, const double* b) {
  double ix = clamp_pos(std::min(a[2], b[2]) - std::max(a[0], b[0]));
  double iy = clamp_pos(std::min(a[3], b[3]) - std::max(a[1], b[1]));
  double inter = ix * iy;
  double area_a = clamp_pos(a[2] - a[0]) * clamp_pos(a[3] - a[1]);
  double area_b = clamp_pos(b[2] - b[0]) * clamp_pos(b[3] - b[1]);
  double uni = area_a + area_b - inter;
  return uni > 0 ? inter / uni : 0.0;
}

double box_area(const double* b) {
  return clamp_pos(b[2] - b[0]) * clamp_pos(b[3] - b[1]);
}

}  // namespace

extern "C" {

// Match one image's detections to its ground truths at one IoU
// threshold / area range. Detections must be pre-sorted by descending
// score and capped at max_dets by the caller.
//
// Outputs: matched[d] in {0,1}, ignored[d] in {0,1}; returns the number
// of non-ignored ground truths.
int spe_match_image(const double* det_boxes, int num_det,
                    const double* gt_boxes, int num_gt,
                    double iou_thr, double area_lo, double area_hi,
                    uint8_t* matched, uint8_t* ignored) {
  std::vector<uint8_t> gt_taken(num_gt, 0);
  std::vector<uint8_t> gt_ignore(num_gt, 0);
  int considered = 0;
  for (int g = 0; g < num_gt; ++g) {
    double a = box_area(gt_boxes + 4 * g);
    gt_ignore[g] = (a < area_lo || a >= area_hi) ? 1 : 0;
    if (!gt_ignore[g]) ++considered;
  }
  for (int d = 0; d < num_det; ++d) {
    matched[d] = 0;
    ignored[d] = 0;
    int best = -1;
    double best_iou = iou_thr;
    for (int g = 0; g < num_gt; ++g) {
      if (gt_taken[g]) continue;
      double v = iou(det_boxes + 4 * d, gt_boxes + 4 * g);
      if (v >= best_iou) {
        if (best >= 0 && gt_ignore[g] && !gt_ignore[best]) continue;
        best = g;
        best_iou = v;
      }
    }
    if (best >= 0) {
      gt_taken[best] = 1;
      if (gt_ignore[best]) {
        ignored[d] = 1;
      } else {
        matched[d] = 1;
      }
    } else {
      double a = box_area(det_boxes + 4 * d);
      if (a < area_lo || a >= area_hi) ignored[d] = 1;
    }
  }
  return considered;
}

// Accumulate AP (101-point interpolated) and max recall over a combined,
// score-sorted det list. matched/ignored as produced by spe_match_image,
// already concatenated across images and sorted by descending score.
// Returns 0 on success; outputs *ap in [0,1], *max_recall in [0,1].
int spe_accumulate(const uint8_t* matched, const uint8_t* ignored, int n,
                   int total_gt, double* ap, double* max_recall) {
  if (total_gt == 0) {
    *ap = std::nan("");
    *max_recall = std::nan("");
    return 0;
  }
  std::vector<double> precision;
  std::vector<double> recall;
  precision.reserve(n);
  recall.reserve(n);
  int tp = 0, fp = 0;
  for (int i = 0; i < n; ++i) {
    if (ignored[i]) continue;
    if (matched[i]) ++tp; else ++fp;
    recall.push_back(double(tp) / total_gt);
    precision.push_back(double(tp) / std::max(tp + fp, 1));
  }
  if (precision.empty()) {
    *ap = 0.0;
    *max_recall = 0.0;
    return 0;
  }
  for (int i = int(precision.size()) - 2; i >= 0; --i) {
    precision[i] = std::max(precision[i], precision[i + 1]);
  }
  double sum = 0.0;
  for (int r = 0; r <= 100; ++r) {
    double thr = r / 100.0;
    auto it = std::lower_bound(recall.begin(), recall.end(), thr);
    if (it != recall.end()) {
      sum += precision[size_t(it - recall.begin())];
    }
  }
  *ap = sum / 101.0;
  *max_recall = recall.back();
  return 0;
}

}  // extern "C"
