// Triangle BVH: signed-distance + raycast oracle for the SDF-from-mesh
// testbed mode.
//
// The reference's analog is an OptiX/CUDA triangle BVH
// (src/triangle_bvh.cu: TriangleBvh4 build :~500, unsigned_distance :405,
// signed_distance_watertight :409, signed_distance_raystab :419, raytrace
// kernels) used to (a) label training points with ground-truth signed
// distances and (b) ray-trace the ground-truth mesh.  On a TPU service the
// oracle runs on HOST: a binary AABB BVH over triangles with
//   * closest-point queries (branch-and-bound, Ericson closest-point-
//     on-triangle) for unsigned distance,
//   * ray casts (Moller-Trumbore) for closest-hit and for parity/stab
//     sign determination.
// Sign convention: negative inside, positive outside (the reference's).
// Sign is majority-voted over K axis-skewed stab rays (the raystab
// scheme): a point is inside when most stabs hit back faces first /
// odd-parity — we use crossing parity per stab, robust for watertight
// meshes and cheap.  Multi-threaded over query points.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};
static inline V3 v3(const float* p) { return {p[0], p[1], p[2]}; }
static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline float norm2(V3 a) { return dot(a, a); }

struct Tri {
  V3 a, b, c;
};

struct Node {
  float bmin[3], bmax[3];
  int32_t left;   // internal: left child (right = left+1); leaf: -1
  int32_t start;  // leaf: first triangle index
  int32_t count;  // leaf: triangle count (0 for internal)
};

struct Bvh {
  std::vector<Tri> tris;
  std::vector<Node> nodes;
};

// Ericson, Real-Time Collision Detection 5.1.5 (public-domain standard
// closest-point-on-triangle; same primitive the reference's
// point_triangle_distance uses).
static V3 closest_on_tri(V3 p, const Tri& t) {
  V3 ab = sub(t.b, t.a), ac = sub(t.c, t.a), ap = sub(p, t.a);
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) return t.a;
  V3 bp = sub(p, t.b);
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) return t.b;
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) return add(t.a, mul(ab, d1 / (d1 - d3)));
  V3 cp = sub(p, t.c);
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) return t.c;
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) return add(t.a, mul(ac, d2 / (d2 - d6)));
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return add(t.b, mul(sub(t.c, t.b), w));
  }
  float denom = 1.0f / (va + vb + vc);
  return add(t.a, add(mul(ab, vb * denom), mul(ac, vc * denom)));
}

static inline float aabb_dist2(const Node& n, V3 p) {
  float d2 = 0;
  const float pc[3] = {p.x, p.y, p.z};
  for (int i = 0; i < 3; i++) {
    float d = std::max({n.bmin[i] - pc[i], 0.0f, pc[i] - n.bmax[i]});
    d2 += d * d;
  }
  return d2;
}

static inline bool aabb_ray(const Node& n, V3 o, V3 inv_d, float tmax) {
  const float oc[3] = {o.x, o.y, o.z};
  const float id[3] = {inv_d.x, inv_d.y, inv_d.z};
  float t0 = 0.0f, t1 = tmax;
  for (int i = 0; i < 3; i++) {
    float ta = (n.bmin[i] - oc[i]) * id[i];
    float tb = (n.bmax[i] - oc[i]) * id[i];
    if (ta > tb) std::swap(ta, tb);
    t0 = std::max(t0, ta);
    t1 = std::min(t1, tb);
  }
  return t0 <= t1;
}

// Moller-Trumbore; returns t > 0 on hit else -1.
static inline float tri_ray(const Tri& tr, V3 o, V3 d) {
  const float eps = 1e-9f;
  V3 e1 = sub(tr.b, tr.a), e2 = sub(tr.c, tr.a);
  V3 pv = cross(d, e2);
  float det = dot(e1, pv);
  if (std::fabs(det) < eps) return -1.0f;
  float inv = 1.0f / det;
  V3 tv = sub(o, tr.a);
  float u = dot(tv, pv) * inv;
  if (u < 0 || u > 1) return -1.0f;
  V3 qv = cross(tv, e1);
  float v = dot(d, qv) * inv;
  if (v < 0 || u + v > 1) return -1.0f;
  float t = dot(e2, qv) * inv;
  return t > eps ? t : -1.0f;
}

static void node_bounds(Node& n, const std::vector<Tri>& tris,
                        const std::vector<int32_t>& idx, int s, int c) {
  for (int i = 0; i < 3; i++) {
    n.bmin[i] = 1e30f;
    n.bmax[i] = -1e30f;
  }
  for (int k = s; k < s + c; k++) {
    const Tri& t = tris[idx[k]];
    const V3 vs[3] = {t.a, t.b, t.c};
    for (const V3& v : vs) {
      const float pc[3] = {v.x, v.y, v.z};
      for (int i = 0; i < 3; i++) {
        n.bmin[i] = std::min(n.bmin[i], pc[i]);
        n.bmax[i] = std::max(n.bmax[i], pc[i]);
      }
    }
  }
}

static int build_node(Bvh& bvh, std::vector<int32_t>& idx,
                      std::vector<V3>& cent, int s, int c) {
  int me = (int)bvh.nodes.size();
  bvh.nodes.push_back({});
  node_bounds(bvh.nodes[me], bvh.tris, idx, s, c);
  if (c <= 4) {
    bvh.nodes[me].left = -1;
    bvh.nodes[me].start = s;
    bvh.nodes[me].count = c;
    return me;
  }
  // median split on the widest centroid axis
  float cmin[3] = {1e30f, 1e30f, 1e30f}, cmax[3] = {-1e30f, -1e30f, -1e30f};
  for (int k = s; k < s + c; k++) {
    const float pc[3] = {cent[idx[k]].x, cent[idx[k]].y, cent[idx[k]].z};
    for (int i = 0; i < 3; i++) {
      cmin[i] = std::min(cmin[i], pc[i]);
      cmax[i] = std::max(cmax[i], pc[i]);
    }
  }
  int ax = 0;
  float w = cmax[0] - cmin[0];
  for (int i = 1; i < 3; i++)
    if (cmax[i] - cmin[i] > w) w = cmax[i] - cmin[i], ax = i;
  auto key = [&](int32_t ti) {
    return ax == 0 ? cent[ti].x : (ax == 1 ? cent[ti].y : cent[ti].z);
  };
  std::nth_element(idx.begin() + s, idx.begin() + s + c / 2,
                   idx.begin() + s + c,
                   [&](int32_t a, int32_t b) { return key(a) < key(b); });
  int mid = c / 2;
  bvh.nodes[me].count = 0;
  int l = build_node(bvh, idx, cent, s, mid);
  (void)l;
  int r = build_node(bvh, idx, cent, s + mid, c - mid);
  (void)r;
  bvh.nodes[me].left = l;
  bvh.nodes[me].start = r;  // store right child in start for internals
  return me;
}

static float closest_dist2(const Bvh& b, V3 p) {
  float best = 1e30f;
  int stack[64];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = b.nodes[stack[--sp]];
    if (aabb_dist2(n, p) >= best) continue;
    if (n.left < 0) {
      for (int k = n.start; k < n.start + n.count; k++) {
        best = std::min(best, norm2(sub(p, closest_on_tri(p, b.tris[k]))));
      }
    } else {
      // near child first
      float dl = aabb_dist2(b.nodes[n.left], p);
      float dr = aabb_dist2(b.nodes[n.start], p);
      int a = n.left, c = n.start;
      if (dr < dl) std::swap(a, c);
      stack[sp++] = c;
      stack[sp++] = a;
    }
  }
  return best;
}

static float raycast(const Bvh& b, V3 o, V3 d, int32_t* hit_tri) {
  V3 inv = {1.0f / (d.x == 0 ? 1e-30f : d.x),
            1.0f / (d.y == 0 ? 1e-30f : d.y),
            1.0f / (d.z == 0 ? 1e-30f : d.z)};
  float best = 1e30f;
  int32_t best_tri = -1;
  int stack[64];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = b.nodes[stack[--sp]];
    if (!aabb_ray(n, o, inv, best)) continue;
    if (n.left < 0) {
      for (int k = n.start; k < n.start + n.count; k++) {
        float t = tri_ray(b.tris[k], o, d);
        if (t > 0 && t < best) best = t, best_tri = k;
      }
    } else {
      stack[sp++] = n.left;
      stack[sp++] = n.start;
    }
  }
  if (hit_tri) *hit_tri = best_tri;
  return best_tri >= 0 ? best : -1.0f;
}

static int parity(const Bvh& b, V3 o, V3 d) {
  V3 inv = {1.0f / (d.x == 0 ? 1e-30f : d.x),
            1.0f / (d.y == 0 ? 1e-30f : d.y),
            1.0f / (d.z == 0 ? 1e-30f : d.z)};
  int crossings = 0;
  int stack[64];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = b.nodes[stack[--sp]];
    if (!aabb_ray(n, o, inv, 1e30f)) continue;
    if (n.left < 0) {
      for (int k = n.start; k < n.start + n.count; k++) {
        if (tri_ray(b.tris[k], o, d) > 0) crossings++;
      }
    } else {
      stack[sp++] = n.left;
      stack[sp++] = n.start;
    }
  }
  return crossings & 1;
}

static void run_threads(int64_t n, int n_threads,
                        const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 0)
    n_threads = (int)std::max(1u, std::thread::hardware_concurrency());
  n_threads = (int)std::min<int64_t>(n_threads, std::max<int64_t>(n, 1));
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; i++) {
    int64_t s = i * chunk, e = std::min<int64_t>(n, s + chunk);
    if (s >= e) break;
    ts.emplace_back(fn, s, e);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void* tbvh_build(const float* verts, int64_t n_verts, const int32_t* faces,
                 int64_t n_faces) {
  (void)n_verts;
  Bvh* b = new Bvh();
  b->tris.resize(n_faces);
  std::vector<V3> cent(n_faces);
  for (int64_t i = 0; i < n_faces; i++) {
    Tri t = {v3(verts + 3 * faces[3 * i]), v3(verts + 3 * faces[3 * i + 1]),
             v3(verts + 3 * faces[3 * i + 2])};
    b->tris[i] = t;
    cent[i] = mul(add(add(t.a, t.b), t.c), 1.0f / 3.0f);
  }
  std::vector<int32_t> idx(n_faces);
  for (int64_t i = 0; i < n_faces; i++) idx[i] = (int32_t)i;
  if (n_faces > 0) {
    build_node(*b, idx, cent, 0, (int)n_faces);
    // reorder triangles so leaves reference contiguous ranges
    std::vector<Tri> reord(n_faces);
    for (int64_t i = 0; i < n_faces; i++) reord[i] = b->tris[idx[i]];
    b->tris.swap(reord);
  }
  return b;
}

void tbvh_free(void* h) { delete (Bvh*)h; }

// Signed distance: negative inside (reference sign convention,
// triangle_bvh.cu signed_distance_*).  Sign = majority vote of 3
// axis-skewed parity stabs (raystab analog — robust on watertight
// meshes, where all stabs agree).
void tbvh_signed_distance(void* h, const float* pts, int64_t n,
                          float* out, int n_threads) {
  const Bvh* b = (const Bvh*)h;
  const V3 dirs[3] = {{0.577f, 0.577f, 0.577f},
                      {-0.713f, 0.251f, 0.655f},
                      {0.162f, -0.912f, 0.377f}};
  run_threads(n, n_threads, [&](int64_t s, int64_t e) {
    for (int64_t i = s; i < e; i++) {
      V3 p = v3(pts + 3 * i);
      float d = std::sqrt(closest_dist2(*b, p));
      int in_votes = 0;
      for (int k = 0; k < 3; k++) in_votes += parity(*b, p, dirs[k]);
      out[i] = in_votes >= 2 ? -d : d;
    }
  });
}

void tbvh_unsigned_distance(void* h, const float* pts, int64_t n,
                            float* out, int n_threads) {
  const Bvh* b = (const Bvh*)h;
  run_threads(n, n_threads, [&](int64_t s, int64_t e) {
    for (int64_t i = s; i < e; i++)
      out[i] = std::sqrt(closest_dist2(*b, v3(pts + 3 * i)));
  });
}

// Closest-hit raycast: out_t = -1 on miss; out_tri = triangle index (in
// BVH order) or -1.
void tbvh_raycast(void* h, const float* origins, const float* dirs,
                  int64_t n, float* out_t, int32_t* out_tri,
                  int n_threads) {
  const Bvh* b = (const Bvh*)h;
  run_threads(n, n_threads, [&](int64_t s, int64_t e) {
    for (int64_t i = s; i < e; i++) {
      int32_t tri = -1;
      out_t[i] = raycast(*b, v3(origins + 3 * i), v3(dirs + 3 * i), &tri);
      if (out_tri) out_tri[i] = tri;
    }
  });
}

// Flat face normals of the BVH-ordered triangles (for GT shading).
void tbvh_face_normals(void* h, float* out) {
  const Bvh* b = (const Bvh*)h;
  for (size_t i = 0; i < b->tris.size(); i++) {
    const Tri& t = b->tris[i];
    V3 nrm = cross(sub(t.b, t.a), sub(t.c, t.a));
    float l = std::sqrt(std::max(norm2(nrm), 1e-20f));
    out[3 * i] = nrm.x / l;
    out[3 * i + 1] = nrm.y / l;
    out[3 * i + 2] = nrm.z / l;
  }
}

int64_t tbvh_n_tris(void* h) { return (int64_t)((Bvh*)h)->tris.size(); }
}
