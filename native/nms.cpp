// Greedy IoU box NMS — C++ port of the reference's Cython/C extension
// (ref: vit_pose/vit_utils/nms/cpu_nms.pyx, generated cpu_nms.c).
//
// Exact semantics preserved: boxes as (x1, y1, x2, y2, score) rows, areas
// with the +1 pixel convention, suppression when IoU >= thresh, iteration
// in descending-score order. Exposed with C linkage for ctypes loading
// (pybind11 is not available in this environment).
//
// Build: g++ -O3 -shared -fPIC -o libnms.so nms.cpp   (see build.py)

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// dets: n x 5 row-major floats. keep_out: caller-allocated, size n.
// Returns the number of kept indices written to keep_out.
int greedy_nms(const float* dets, int n, float thresh, int* keep_out) {
  if (n <= 0) return 0;
  std::vector<float> areas(n);
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) {
    const float* b = dets + i * 5;
    areas[i] = (b[2] - b[0] + 1.0f) * (b[3] - b[1] + 1.0f);
    order[i] = i;
  }
  // descending score; stable to match numpy argsort-then-reverse tie order
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });

  std::vector<uint8_t> suppressed(n, 0);
  int n_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float* bi = dets + i * 5;
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = dets + j * 5;
      const float xx1 = std::max(bi[0], bj[0]);
      const float yy1 = std::max(bi[1], bj[1]);
      const float xx2 = std::min(bi[2], bj[2]);
      const float yy2 = std::min(bi[3], bj[3]);
      const float w = std::max(0.0f, xx2 - xx1 + 1.0f);
      const float h = std::max(0.0f, yy2 - yy1 + 1.0f);
      const float inter = w * h;
      const float ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr >= thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

}  // extern "C"
