// 3D KD-tree for SLAM overlap queries.
//
// Native replacement for the scipy.spatial.KDTree the reference uses on its
// SLAM hot loop (reference: must3r/slam/nns.py:40-62). Same usage pattern:
// the tree is (re)built from the full point set whenever keyframe points are
// committed, then queried with one-nearest-neighbor distance lookups for
// every confident pixel of the incoming frame.
//
// Implementation: implicit balanced KD-tree in a flat array (median split by
// nth_element over the widest axis), iterative best-first 1-NN descent with
// an explicit stack. No dependencies; built with `g++ -O3 -shared`.
//
// C ABI (ctypes):
//   kd3_create(points, n)      -> handle (copies the [n,3] float32 data)
//   kd3_query(handle, q, m, out_d2)  -> squared NN distance per query
//   kd3_destroy(handle)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct KD3 {
  // flat, heap-ordered tree: node i has children 2i+1 / 2i+2
  std::vector<float> pts;     // [n, 3] reordered
  std::vector<int> axis;      // split axis per node (-1 = leaf slot empty)
  int64_t n = 0;
};

void build(KD3* t, float* scratch, int64_t lo, int64_t hi, int64_t node) {
  if (lo >= hi) return;
  // widest axis of the bounding box
  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = lo; i < hi; i++) {
    for (int d = 0; d < 3; d++) {
      float v = scratch[i * 3 + d];
      mn[d] = std::min(mn[d], v);
      mx[d] = std::max(mx[d], v);
    }
  }
  int ax = 0;
  float best = mx[0] - mn[0];
  for (int d = 1; d < 3; d++) {
    if (mx[d] - mn[d] > best) { best = mx[d] - mn[d]; ax = d; }
  }
  int64_t mid = lo + (hi - lo) / 2;
  struct Row { float v[3]; };
  Row* rows = reinterpret_cast<Row*>(scratch);
  std::nth_element(rows + lo, rows + mid, rows + hi,
                   [ax](const Row& a, const Row& b) { return a.v[ax] < b.v[ax]; });
  t->axis[node] = ax;
  std::memcpy(&t->pts[node * 3], &scratch[mid * 3], 3 * sizeof(float));
  build(t, scratch, lo, mid, 2 * node + 1);
  build(t, scratch, mid + 1, hi, 2 * node + 2);
}

inline float dist2(const float* a, const float* b) {
  float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

float query_one(const KD3* t, const float* q) {
  if (t->n == 0) return std::numeric_limits<float>::infinity();
  const int64_t cap = (int64_t)t->axis.size();
  float best = std::numeric_limits<float>::infinity();
  // explicit DFS stack: (node, squared distance to splitting plane boundary)
  int64_t stack_node[128];
  float stack_d2[128];
  int sp = 0;
  stack_node[sp] = 0;
  stack_d2[sp++] = 0.f;
  while (sp > 0) {
    int64_t node = stack_node[--sp];
    float bound = stack_d2[sp];
    if (bound >= best) continue;
    while (node < cap && t->axis[node] >= 0) {
      const float* p = &t->pts[node * 3];
      float d2 = dist2(p, q);
      if (d2 < best) best = d2;
      int ax = t->axis[node];
      float diff = q[ax] - p[ax];
      int64_t near_c = 2 * node + (diff < 0 ? 1 : 2);
      int64_t far_c = 2 * node + (diff < 0 ? 2 : 1);
      float far_d2 = diff * diff;
      if (far_d2 < best && far_c < cap && sp < 128) {
        stack_node[sp] = far_c;
        stack_d2[sp++] = far_d2;
      }
      node = near_c;
    }
  }
  return best;
}

}  // namespace

extern "C" {

void* kd3_create(const float* points, int64_t n) {
  KD3* t = new KD3();
  t->n = n;
  // capacity: next power of two bound on heap indices
  int64_t cap = 1;
  while (cap < n + 1) cap <<= 1;
  cap <<= 1;
  t->pts.assign(cap * 3, 0.f);
  t->axis.assign(cap, -1);
  if (n > 0) {
    std::vector<float> scratch(points, points + n * 3);
    build(t, scratch.data(), 0, n, 0);
  }
  return t;
}

void kd3_query(const void* handle, const float* queries, int64_t m,
               float* out_d2) {
  const KD3* t = static_cast<const KD3*>(handle);
  for (int64_t i = 0; i < m; i++) {
    out_d2[i] = query_one(t, &queries[i * 3]);
  }
}

int64_t kd3_size(const void* handle) {
  return static_cast<const KD3*>(handle)->n;
}

void kd3_destroy(void* handle) { delete static_cast<KD3*>(handle); }

}  // extern "C"
