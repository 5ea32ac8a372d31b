// Native mesh-topology kernel: Crouzeix-Raviart edge (segment) enumeration.
//
// TPU-native counterpart of the reference's native mesh dependency: the
// reference delegates meshing to the gmsh C++ kernel (crbe.py:14-44) and
// then enumerates edge DOFs in a Python dict loop (crbe.py:109-131, ~0.9 s
// at mesh size 128). This kernel implements the same first-encounter
// enumeration contract - per triangle, local edges in the order
// [(v1,v2),(v2,v0),(v0,v1)], keyed by the sorted vertex pair, ids assigned
// in encounter order - as a single O(n) pass over an open-addressing hash
// table. Exposed through a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make (see native/Makefile) -> libmeshtopo.so

#include <cstdint>
#include <vector>

namespace {

struct HashTable {
  // Open addressing, power-of-two capacity, linear probing.
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  int64_t mask;

  explicit HashTable(int64_t expected) {
    int64_t cap = 16;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, -1);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  // Returns existing id or inserts next_id.
  int32_t get_or_insert(int64_t key, int32_t next_id, bool* inserted) {
    uint64_t h = static_cast<uint64_t>(key);
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    int64_t idx = static_cast<int64_t>(h) & mask;
    while (true) {
      if (keys[idx] == -1) {
        keys[idx] = key;
        vals[idx] = next_id;
        *inserted = true;
        return next_id;
      }
      if (keys[idx] == key) {
        *inserted = false;
        return vals[idx];
      }
      idx = (idx + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Enumerate unique undirected edges of a triangle mesh in first-encounter
// order (the crbe.py:109-131 contract).
//
// Inputs:
//   tris:      n_tri x 3 vertex ids (int32, row major)
//   n_tri:     triangle count
//   n_points:  vertex count (for edge keying)
// Outputs (caller-allocated):
//   tri_to_seg: n_tri x 3 segment ids (int32)
//   segments:   capacity 3 * n_tri pairs; filled with (a, b), a < b (int32)
//   n_seg_out:  number of unique segments written
// Returns 0 on success, nonzero on invalid input.
int64_t enumerate_edges(const int32_t* tris, int64_t n_tri, int64_t n_points,
                        int32_t* tri_to_seg, int32_t* segments,
                        int64_t* n_seg_out) {
  if (n_tri < 0 || n_points <= 0) return 1;
  HashTable table(3 * n_tri);
  int32_t next_id = 0;
  // Local edge order: [(v1,v2), (v2,v0), (v0,v1)] (crbe.py:117).
  static const int kEdge[3][2] = {{1, 2}, {2, 0}, {0, 1}};
  for (int64_t t = 0; t < n_tri; ++t) {
    const int32_t* tri = tris + 3 * t;
    for (int e = 0; e < 3; ++e) {
      int32_t a = tri[kEdge[e][0]];
      int32_t b = tri[kEdge[e][1]];
      if (a < 0 || b < 0 || a >= n_points || b >= n_points) return 2;
      int32_t lo = a < b ? a : b;
      int32_t hi = a < b ? b : a;
      int64_t key = static_cast<int64_t>(lo) * n_points + hi;
      bool inserted = false;
      int32_t id = table.get_or_insert(key, next_id, &inserted);
      if (inserted) {
        segments[2 * next_id] = lo;
        segments[2 * next_id + 1] = hi;
        ++next_id;
      }
      tri_to_seg[3 * t + e] = id;
    }
  }
  *n_seg_out = next_id;
  return 0;
}

}  // extern "C"
