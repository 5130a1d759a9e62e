// KD-tree nearest-neighbor queries on the host, OpenMP-parallel.
//
// Native replacement for the reference's vendored pykdtree
// (lib_shape_prior/.../libkdtree) used by the metric suite (chamfer
// distance, evaluate.py:33-40). Median-split build, iterative-recursion
// query with branch pruning. float32, 3-D points (the only case the
// pipeline needs).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Node {
  float split;       // split coordinate
  int32_t axis;      // -1 for leaf
  int32_t left, right;
  int32_t begin, end;  // leaf point range (indices into order)
};

struct Tree {
  std::vector<float> pts;      // 3 * n
  std::vector<int32_t> order;  // permutation of point ids
  std::vector<Node> nodes;
  int32_t root = -1;
  static constexpr int kLeafSize = 16;

  int32_t Build(int32_t begin, int32_t end, int depth) {
    Node node;
    node.begin = begin;
    node.end = end;
    node.left = node.right = -1;
    if (end - begin <= kLeafSize) {
      node.axis = -1;
      node.split = 0;
      nodes.push_back(node);
      return static_cast<int32_t>(nodes.size() - 1);
    }
    // Pick the axis with the largest extent.
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = begin; i < end; ++i) {
      const float* p = &pts[3 * order[i]];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], p[a]);
        hi[a] = std::max(hi[a], p[a]);
      }
    }
    int axis = 0;
    float ext = hi[0] - lo[0];
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > ext) {
        ext = hi[a] - lo[a];
        axis = a;
      }
    int32_t mid = (begin + end) / 2;
    std::nth_element(
        order.begin() + begin, order.begin() + mid, order.begin() + end,
        [&](int32_t a, int32_t b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    node.axis = axis;
    node.split = pts[3 * order[mid] + axis];
    int32_t self = static_cast<int32_t>(nodes.size());
    nodes.push_back(node);
    int32_t l = Build(begin, mid, depth + 1);
    int32_t r = Build(mid, end, depth + 1);
    nodes[self].left = l;
    nodes[self].right = r;
    return self;
  }

  void Query1(const float* q, float& best_d2, int32_t& best_id,
              int32_t node_id) const {
    const Node& n = nodes[node_id];
    if (n.axis < 0) {
      for (int32_t i = n.begin; i < n.end; ++i) {
        const float* p = &pts[3 * order[i]];
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < best_d2) {
          best_d2 = d2;
          best_id = order[i];
        }
      }
      return;
    }
    float diff = q[n.axis] - n.split;
    int32_t near = diff <= 0 ? n.left : n.right;
    int32_t far = diff <= 0 ? n.right : n.left;
    Query1(q, best_d2, best_id, near);
    if (diff * diff < best_d2) Query1(q, best_d2, best_id, far);
  }
};

}  // namespace

extern "C" {

Tree* kdtree_build(const float* points, int64_t n) {
  auto* t = new Tree();
  t->pts.assign(points, points + 3 * n);
  t->order.resize(n);
  for (int64_t i = 0; i < n; ++i) t->order[i] = static_cast<int32_t>(i);
  t->root = t->Build(0, static_cast<int32_t>(n), 0);
  return t;
}

void kdtree_query(const Tree* t, const float* queries, int64_t m,
                  float* out_dist, int32_t* out_idx) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < m; ++i) {
    float best_d2 = std::numeric_limits<float>::max();
    int32_t best_id = -1;
    t->Query1(&queries[3 * i], best_d2, best_id, t->root);
    out_dist[i] = std::sqrt(best_d2);
    out_idx[i] = best_id;
  }
}

void kdtree_free(Tree* t) { delete t; }

}  // extern "C"
