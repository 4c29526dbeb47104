// Incremental voxel-hash point store with KNN queries.
//
// Native host-side companion to the device-resident voxel feature map:
// the TPU-native equivalent of the reference's iVox structure inside the
// `svo` extension (reference third_party/sparse_octree/src/ivox3d.h:
// unordered_map voxel hash + LRU, <=N points per voxel, nearby-6/18/26
// KNN). Written from scratch with a C ABI so Python binds via ctypes (no
// pybind11 in this image).
//
// Design:
//   * open-addressing hash table (power-of-two capacity, linear probing)
//     keyed by packed 21-bit-per-axis signed voxel coordinates;
//   * per-voxel ring buffer of up to `points_per_voxel` points (xyz + rgb);
//   * KNN searches the 3^3 neighborhood of the query's voxel and
//     partial-sorts by squared distance (NEARBY26 semantics);
//   * bulk insert / query entry points are OpenMP-free but batch-oriented:
//     one call amortizes the FFI crossing over thousands of points.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Point {
  float x, y, z;
  float r, g, b;
};

struct Bucket {
  int64_t key = kEmpty;
  int32_t head = 0;    // ring cursor
  int32_t count = 0;   // stored points (<= cap)
  int32_t offset = -1; // index into the point pool (cap slots)
  static constexpr int64_t kEmpty = INT64_MIN;
};

struct Store {
  double inv_voxel;
  float voxel_size;
  int32_t ppv;            // points per voxel
  uint64_t mask;          // table size - 1
  std::vector<Bucket> table;
  std::vector<Point> pool;
  int64_t num_voxels = 0;
  int64_t dropped = 0;    // inserts refused because the table was full
};

inline int64_t pack(int32_t x, int32_t y, int32_t z) {
  const int64_t B = 1 << 20;  // 21-bit signed range per axis
  return (((int64_t)(x + B)) << 42) | (((int64_t)(y + B)) << 21) |
         (int64_t)(z + B);
}

inline uint64_t hash_key(int64_t key) {
  uint64_t h = (uint64_t)key;
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdULL;
  h ^= h >> 33;
  h *= 0xc4ceb9fe1a85ec53ULL;
  h ^= h >> 33;
  return h;
}

// find or insert; returns bucket index or -1 when the table is full
int64_t find_bucket(Store* s, int64_t key, bool insert) {
  uint64_t idx = hash_key(key) & s->mask;
  for (uint64_t probe = 0; probe <= s->mask; ++probe) {
    Bucket& b = s->table[idx];
    if (b.key == key) return (int64_t)idx;
    if (b.key == Bucket::kEmpty) {
      if (!insert) return -1;
      b.key = key;
      b.offset = (int32_t)(s->num_voxels * s->ppv);
      s->num_voxels++;
      return (int64_t)idx;
    }
    idx = (idx + 1) & s->mask;
  }
  return -1;
}

}  // namespace

extern "C" {

void* ps_create(float voxel_size, int64_t max_voxels, int32_t points_per_voxel) {
  Store* s = new Store();
  s->voxel_size = voxel_size;
  s->inv_voxel = 1.0 / voxel_size;
  s->ppv = points_per_voxel;
  uint64_t cap = 1;
  while (cap < (uint64_t)(max_voxels * 2)) cap <<= 1;
  s->mask = cap - 1;
  s->table.assign(cap, Bucket());
  s->pool.resize((size_t)max_voxels * points_per_voxel);
  return s;
}

void ps_destroy(void* handle) { delete (Store*)handle; }

int64_t ps_num_voxels(void* handle) { return ((Store*)handle)->num_voxels; }
int64_t ps_num_dropped(void* handle) { return ((Store*)handle)->dropped; }

// Insert n points with colors; voxels allocated on demand. When a voxel's
// ring is full the oldest point is replaced (the reference replaces the
// subspace occupant, ivox3d_node.hpp / octree.cpp:218-224).
void ps_insert(void* handle, int64_t n, const float* xyz, const float* rgb) {
  Store* s = (Store*)handle;
  const int64_t max_voxels = (int64_t)s->pool.size() / s->ppv;
  for (int64_t i = 0; i < n; ++i) {
    const float px = xyz[3 * i], py = xyz[3 * i + 1], pz = xyz[3 * i + 2];
    const int32_t vx = (int32_t)std::floor(px * s->inv_voxel);
    const int32_t vy = (int32_t)std::floor(py * s->inv_voxel);
    const int32_t vz = (int32_t)std::floor(pz * s->inv_voxel);
    if (s->num_voxels >= max_voxels) {
      // only existing voxels can absorb points now
      int64_t bi = find_bucket(s, pack(vx, vy, vz), false);
      if (bi < 0) { s->dropped++; continue; }
      Bucket& b = s->table[bi];
      Point& p = s->pool[b.offset + b.head];
      p = {px, py, pz, rgb ? rgb[3 * i] : 0.f, rgb ? rgb[3 * i + 1] : 0.f,
           rgb ? rgb[3 * i + 2] : 0.f};
      b.head = (b.head + 1) % s->ppv;
      if (b.count < s->ppv) b.count++;
      continue;
    }
    int64_t bi = find_bucket(s, pack(vx, vy, vz), true);
    if (bi < 0) { s->dropped++; continue; }
    Bucket& b = s->table[bi];
    Point& p = s->pool[b.offset + b.head];
    p = {px, py, pz, rgb ? rgb[3 * i] : 0.f, rgb ? rgb[3 * i + 1] : 0.f,
         rgb ? rgb[3 * i + 2] : 0.f};
    b.head = (b.head + 1) % s->ppv;
    if (b.count < s->ppv) b.count++;
  }
}

// K nearest stored points for each query (NEARBY26 search). Outputs are
// padded: dist2 = -1 for missing neighbors.
void ps_knn(void* handle, int64_t n, const float* xyz, int32_t k,
            float* out_xyz, float* out_rgb, float* out_dist2) {
  Store* s = (Store*)handle;
  std::vector<std::pair<float, const Point*>> cand;
  for (int64_t i = 0; i < n; ++i) {
    const float px = xyz[3 * i], py = xyz[3 * i + 1], pz = xyz[3 * i + 2];
    const int32_t vx = (int32_t)std::floor(px * s->inv_voxel);
    const int32_t vy = (int32_t)std::floor(py * s->inv_voxel);
    const int32_t vz = (int32_t)std::floor(pz * s->inv_voxel);
    cand.clear();
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int64_t bi = find_bucket(s, pack(vx + dx, vy + dy, vz + dz), false);
          if (bi < 0) continue;
          const Bucket& b = s->table[bi];
          for (int32_t j = 0; j < b.count; ++j) {
            const Point& p = s->pool[b.offset + j];
            const float ddx = p.x - px, ddy = p.y - py, ddz = p.z - pz;
            cand.emplace_back(ddx * ddx + ddy * ddy + ddz * ddz, &p);
          }
        }
    const int32_t kk = std::min<int64_t>(k, (int64_t)cand.size());
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end(),
                      [](auto& a, auto& b) { return a.first < b.first; });
    for (int32_t j = 0; j < k; ++j) {
      float* oxyz = out_xyz + (i * k + j) * 3;
      float* orgb = out_rgb ? out_rgb + (i * k + j) * 3 : nullptr;
      if (j < kk) {
        const Point* p = cand[j].second;
        oxyz[0] = p->x; oxyz[1] = p->y; oxyz[2] = p->z;
        if (orgb) { orgb[0] = p->r; orgb[1] = p->g; orgb[2] = p->b; }
        if (out_dist2) out_dist2[i * k + j] = cand[j].first;
      } else {
        oxyz[0] = oxyz[1] = oxyz[2] = 0.f;
        if (orgb) orgb[0] = orgb[1] = orgb[2] = 0.f;
        if (out_dist2) out_dist2[i * k + j] = -1.f;
      }
    }
  }
}

// Export voxel centers: out_centers must hold num_voxels * 3 floats.
void ps_export_voxels(void* handle, float* out_centers) {
  Store* s = (Store*)handle;
  std::vector<int64_t> order((size_t)s->num_voxels, -1);
  for (uint64_t i = 0; i <= s->mask; ++i) {
    const Bucket& b = s->table[i];
    if (b.key == Bucket::kEmpty) continue;
    order[b.offset / s->ppv] = (int64_t)i;
  }
  const int64_t B = 1 << 20;
  for (int64_t v = 0; v < s->num_voxels; ++v) {
    const Bucket& b = s->table[order[v]];
    const int64_t key = b.key;
    const int32_t x = (int32_t)((key >> 42) & ((1 << 21) - 1)) - B;
    const int32_t y = (int32_t)((key >> 21) & ((1 << 21) - 1)) - B;
    const int32_t z = (int32_t)(key & ((1 << 21) - 1)) - B;
    out_centers[3 * v] = (x + 0.5f) * s->voxel_size;
    out_centers[3 * v + 1] = (y + 0.5f) * s->voxel_size;
    out_centers[3 * v + 2] = (z + 0.5f) * s->voxel_size;
  }
}

// Export per-voxel points: out arrays sized num_voxels * ppv * 3; count
// array sized num_voxels.
void ps_export_points(void* handle, float* out_xyz, float* out_rgb,
                      int32_t* out_counts) {
  Store* s = (Store*)handle;
  for (uint64_t i = 0; i <= s->mask; ++i) {
    const Bucket& b = s->table[i];
    if (b.key == Bucket::kEmpty) continue;
    const int64_t v = b.offset / s->ppv;
    out_counts[v] = b.count;
    for (int32_t j = 0; j < s->ppv; ++j) {
      const Point& p = s->pool[b.offset + j];
      const bool live = j < b.count;
      out_xyz[(v * s->ppv + j) * 3] = live ? p.x : 0.f;
      out_xyz[(v * s->ppv + j) * 3 + 1] = live ? p.y : 0.f;
      out_xyz[(v * s->ppv + j) * 3 + 2] = live ? p.z : 0.f;
      if (out_rgb) {
        out_rgb[(v * s->ppv + j) * 3] = live ? p.r : 0.f;
        out_rgb[(v * s->ppv + j) * 3 + 1] = live ? p.g : 0.f;
        out_rgb[(v * s->ppv + j) * 3 + 2] = live ? p.b : 0.f;
      }
    }
  }
}

}  // extern "C"
