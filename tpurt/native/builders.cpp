// Native acceleration-structure builders (SURVEY.md §2 rows R4/R5: the
// reference builds its BVH/grid on the C++ host; these are the new
// framework's equivalents, exposed through a C ABI consumed via ctypes —
// tpurt/accel/native.py — with the numpy builders as fallback).
//
// Build: see tpurt/native/Makefile (g++ -O3 -shared -fPIC).
//
// Both builders emit the SAME flattened cluster-block format the Pallas
// traversal kernel streams (tpurt/accel/clusters.py): (C, leaf) int32
// triangle ids padded with duplicates + per-cluster AABBs.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Clusters {
  std::vector<int32_t> tri_ids;  // C * leaf
  std::vector<float> lo;         // C * 3
  std::vector<float> hi;         // C * 3
  int64_t n = 0;
  int leaf = 128;
};

struct V3 {
  float x, y, z;
};

inline V3 vmin(V3 a, V3 b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(V3 a, V3 b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

void emit_leaf(Clusters* out, const int64_t* idx, int64_t count,
               const V3* tlo, const V3* thi) {
  V3 lo = tlo[idx[0]], hi = thi[idx[0]];
  for (int64_t i = 1; i < count; ++i) {
    lo = vmin(lo, tlo[idx[i]]);
    hi = vmax(hi, thi[idx[i]]);
  }
  for (int64_t i = 0; i < out->leaf; ++i) {
    out->tri_ids.push_back(
        static_cast<int32_t>(idx[i < count ? i : 0]));  // pad = duplicate
  }
  out->lo.insert(out->lo.end(), {lo.x, lo.y, lo.z});
  out->hi.insert(out->hi.end(), {hi.x, hi.y, hi.z});
  out->n += 1;
}

}  // namespace

extern "C" {

// Sweep-SAH cluster BVH: each node sweeps ALL THREE centroid-sorted axes
// and splits at the leaf-multiple boundary with the best surface-area-
// heuristic cost (leaves come out full; exactly one partial cluster
// globally).  SAH minimizes sum of child-box surface areas weighted by
// triangle count — for the flat traversal this directly minimizes the
// expected cull-survivor count per ray bundle, the kernel's measured cost
// driver (BASELINE.md survivor stats).  Measured vs median-split: total
// cluster area −8% on the 1M-tri config-5 mesh, −3% on config 4.
// 3 sorts per node, host-side one-time cost (~3 s at 1M tris).
namespace {
inline float half_area(V3 lo, V3 hi) {
  float dx = std::max(hi.x - lo.x, 0.f), dy = std::max(hi.y - lo.y, 0.f),
        dz = std::max(hi.z - lo.z, 0.f);
  return dx * dy + dy * dz + dz * dx;
}
}  // namespace

void* tpurt_build_clusters(const float* verts, int64_t /*V*/,
                           const int32_t* tris, int64_t T, int leaf,
                           int64_t* out_C) {
  auto* out = new Clusters();
  out->leaf = leaf;
  if (T == 0) {
    *out_C = 0;
    return out;
  }

  std::vector<V3> tlo(T), thi(T), cent(T);
  for (int64_t t = 0; t < T; ++t) {
    const float* a = verts + 3 * static_cast<int64_t>(tris[3 * t + 0]);
    const float* b = verts + 3 * static_cast<int64_t>(tris[3 * t + 1]);
    const float* c = verts + 3 * static_cast<int64_t>(tris[3 * t + 2]);
    V3 va{a[0], a[1], a[2]}, vb{b[0], b[1], b[2]}, vc{c[0], c[1], c[2]};
    tlo[t] = vmin(va, vmin(vb, vc));
    thi[t] = vmax(va, vmax(vb, vc));
    cent[t] = {(tlo[t].x + thi[t].x) * 0.5f, (tlo[t].y + thi[t].y) * 0.5f,
               (tlo[t].z + thi[t].z) * 0.5f};
  }

  std::vector<int64_t> idx(T);
  for (int64_t t = 0; t < T; ++t) idx[t] = t;
  // per-axis scratch (each axis sweep owns one so they can run in
  // parallel on big nodes)
  std::vector<float> rarea[3] = {std::vector<float>(T),
                                 std::vector<float>(T),
                                 std::vector<float>(T)};
  std::vector<int64_t> axbuf[3] = {std::vector<int64_t>(T),
                                   std::vector<int64_t>(T),
                                   std::vector<int64_t>(T)};

  std::vector<std::pair<int64_t, int64_t>> stack;  // [begin, end)
  stack.emplace_back(0, T);
  while (!stack.empty()) {
    auto [b, e] = stack.back();
    stack.pop_back();
    int64_t n = e - b;
    if (n <= leaf) {
      emit_leaf(out, idx.data() + b, n, tlo.data(), thi.data());
      continue;
    }
    // sweep every axis; keep the (axis, split) with the globally best SAH
    float best = 3.4e38f;
    int64_t best_k = std::max<int64_t>(
        leaf, ((n / 2 + leaf / 2) / leaf) * leaf);  // median fallback
    best_k = std::min<int64_t>(best_k, n - 1);
    // per-axis sweep: sort the candidate order, build suffix right-box
    // areas, then scan leaf-multiple split positions.  Left child keeps a
    // multiple of `leaf` triangles (full clusters); the remainder
    // accumulates to the globally-rightmost leaf.
    float ax_cost[3];
    int64_t ax_k[3];
    auto eval_axis = [&](int axis) {
      auto& buf = axbuf[axis];
      auto& ra = rarea[axis];
      std::copy(idx.begin() + b, idx.begin() + e, buf.begin());
      std::sort(buf.begin(), buf.begin() + n,
                [&](int64_t p, int64_t q) {
                  return (&cent[p].x)[axis] < (&cent[q].x)[axis];
                });
      V3 rlo = tlo[buf[n - 1]], rhi = thi[buf[n - 1]];
      for (int64_t i = n - 1; i >= 1; --i) {
        rlo = vmin(rlo, tlo[buf[i]]);
        rhi = vmax(rhi, thi[buf[i]]);
        ra[i] = half_area(rlo, rhi);
      }
      V3 llo = tlo[buf[0]], lhi = thi[buf[0]];
      float bc = 3.4e38f;
      int64_t bk = -1;
      for (int64_t i = 0; i < n - 1; ++i) {
        llo = vmin(llo, tlo[buf[i]]);
        lhi = vmax(lhi, thi[buf[i]]);
        int64_t k = i + 1;
        if (k % leaf != 0) continue;
        float cost = half_area(llo, lhi) * float(k) + ra[k] * float(n - k);
        if (cost < bc) {
          bc = cost;
          bk = k;
        }
      }
      ax_cost[axis] = bc;
      ax_k[axis] = bk;
    };
    if (n > (int64_t)32 * 1024) {
      // the top-level sorts dominate build time — run the three axis
      // sweeps concurrently (each owns its scratch)
      std::thread t1(eval_axis, 1), t2(eval_axis, 2);
      eval_axis(0);
      t1.join();
      t2.join();
    } else {
      for (int axis = 0; axis < 3; ++axis) eval_axis(axis);
    }
    int bax = -1;
    for (int axis = 0; axis < 3; ++axis) {
      if (ax_k[axis] >= 0 && ax_cost[axis] < best) {
        best = ax_cost[axis];
        bax = axis;
      }
    }
    if (bax >= 0) {
      best_k = ax_k[bax];
      std::copy(axbuf[bax].begin(), axbuf[bax].begin() + n, idx.begin() + b);
    }
    int64_t mid = b + best_k;
    stack.emplace_back(b, mid);
    stack.emplace_back(mid, e);
  }
  *out_C = out->n;
  return out;
}

// Uniform grid: triangles rasterized into cells by AABB overlap; each
// occupied cell spills into >=1 cluster blocks whose AABB is the (tight)
// cell∩content box.  Returns the same Clusters format.
void* tpurt_build_grid(const float* verts, int64_t /*V*/, const int32_t* tris,
                       int64_t T, int target_per_cell, int leaf,
                       int64_t* out_C) {
  auto* out = new Clusters();
  out->leaf = leaf;
  if (T == 0) {
    *out_C = 0;
    return out;
  }

  std::vector<V3> tlo(T), thi(T);
  V3 slo{3e38f, 3e38f, 3e38f}, shi{-3e38f, -3e38f, -3e38f};
  for (int64_t t = 0; t < T; ++t) {
    const float* a = verts + 3 * static_cast<int64_t>(tris[3 * t + 0]);
    const float* b = verts + 3 * static_cast<int64_t>(tris[3 * t + 1]);
    const float* c = verts + 3 * static_cast<int64_t>(tris[3 * t + 2]);
    V3 va{a[0], a[1], a[2]}, vb{b[0], b[1], b[2]}, vc{c[0], c[1], c[2]};
    tlo[t] = vmin(va, vmin(vb, vc));
    thi[t] = vmax(va, vmax(vb, vc));
    slo = vmin(slo, tlo[t]);
    shi = vmax(shi, thi[t]);
  }
  float ext[3] = {std::max(shi.x - slo.x, 1e-6f),
                  std::max(shi.y - slo.y, 1e-6f),
                  std::max(shi.z - slo.z, 1e-6f)};
  double n_cells = std::max<double>(1.0, double(T) / target_per_cell);
  double vol = double(ext[0]) * ext[1] * ext[2];
  double k = std::cbrt(n_cells / vol);
  int64_t dims[3];
  for (int a = 0; a < 3; ++a) {
    dims[a] = std::max<int64_t>(
        1, std::min<int64_t>(256, (int64_t)std::ceil(ext[a] * k)));
  }
  float cell[3] = {ext[0] / dims[0], ext[1] / dims[1], ext[2] / dims[2]};
  const float* slo_p = &slo.x;

  auto cell_of = [&](const float* p, int64_t* c) {
    for (int a = 0; a < 3; ++a) {
      int64_t v = (int64_t)((p[a] - slo_p[a]) / cell[a]);
      c[a] = std::max<int64_t>(0, std::min(dims[a] - 1, v));
    }
  };

  std::unordered_map<int64_t, std::vector<int64_t>> cells;
  for (int64_t t = 0; t < T; ++t) {
    int64_t c0[3], c1[3];
    cell_of(&tlo[t].x, c0);
    cell_of(&thi[t].x, c1);
    for (int64_t x = c0[0]; x <= c1[0]; ++x)
      for (int64_t y = c0[1]; y <= c1[1]; ++y)
        for (int64_t z = c0[2]; z <= c1[2]; ++z)
          cells[(x * dims[1] + y) * dims[2] + z].push_back(t);
  }

  for (auto& [key, ids] : cells) {
    int64_t z = key % dims[2], y = (key / dims[2]) % dims[1],
            x = key / (dims[1] * dims[2]);
    V3 clo{slo.x + x * cell[0], slo.y + y * cell[1], slo.z + z * cell[2]};
    V3 chi{clo.x + cell[0], clo.y + cell[1], clo.z + cell[2]};
    for (size_t s = 0; s < ids.size(); s += leaf) {
      int64_t cnt = std::min<int64_t>(leaf, ids.size() - s);
      // tight bounds: content ∩ cell
      V3 blo = tlo[ids[s]], bhi = thi[ids[s]];
      for (int64_t i = 1; i < cnt; ++i) {
        blo = vmin(blo, tlo[ids[s + i]]);
        bhi = vmax(bhi, thi[ids[s + i]]);
      }
      blo = vmax(blo, clo);
      bhi = vmin(bhi, chi);
      for (int64_t i = 0; i < leaf; ++i) {
        out->tri_ids.push_back(
            static_cast<int32_t>(ids[s + (i < cnt ? i : 0)]));
      }
      out->lo.insert(out->lo.end(), {blo.x, blo.y, blo.z});
      out->hi.insert(out->hi.end(), {bhi.x, bhi.y, bhi.z});
      out->n += 1;
    }
  }
  *out_C = out->n;
  return out;
}

void tpurt_get_clusters(void* handle, int32_t* tri_ids, float* lo, float* hi) {
  auto* c = static_cast<Clusters*>(handle);
  std::memcpy(tri_ids, c->tri_ids.data(), c->tri_ids.size() * sizeof(int32_t));
  std::memcpy(lo, c->lo.data(), c->lo.size() * sizeof(float));
  std::memcpy(hi, c->hi.data(), c->hi.size() * sizeof(float));
}

void tpurt_free_clusters(void* handle) {
  delete static_cast<Clusters*>(handle);
}

}  // extern "C"
