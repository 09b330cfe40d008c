// Host-side ingest kernels for hdl_graph_slam_tpu.
//
// The reference's ingestion path is C++ end-to-end (nodelets + PCL); in
// this framework the device does the heavy numerics, but the host data
// loader still touches every raw byte: PointCloud2 field extraction and a
// pre-transfer voxel reduction for very large raw scans (cutting host ->
// device PCIe/ICI transfer). These are the native equivalents of
// pcl::fromROSMsg and pcl::VoxelGrid driven by apps/prefiltering_nodelet.cpp.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Extract x/y/z (+optional intensity) fields from a PointCloud2 data blob.
// Drops non-finite points. Returns the number of valid points written.
int pc2_extract(const uint8_t* data, int64_t n_points, int32_t point_step,
                int32_t x_off, int32_t y_off, int32_t z_off, int32_t i_off,
                float* out_xyz, float* out_intensity) {
  int64_t m = 0;
  for (int64_t i = 0; i < n_points; ++i) {
    const uint8_t* p = data + i * point_step;
    float x, y, z;
    std::memcpy(&x, p + x_off, 4);
    std::memcpy(&y, p + y_off, 4);
    std::memcpy(&z, p + z_off, 4);
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    out_xyz[3 * m + 0] = x;
    out_xyz[3 * m + 1] = y;
    out_xyz[3 * m + 2] = z;
    if (i_off >= 0 && out_intensity) {
      float v;
      std::memcpy(&v, p + i_off, 4);
      out_intensity[m] = v;
    }
    ++m;
  }
  return static_cast<int>(m);
}

// Open-addressing voxel-centroid downsample (pcl::VoxelGrid semantics:
// floor(coord/res) cells, centroid of members). Single pass, linear
// probing; deterministic output order is NOT guaranteed (centroid set is).
// Returns number of voxels written to out_xyz (<= cap), or -1 if the hash
// table overflowed.
int voxel_downsample(const float* xyz, int64_t n, float resolution,
                     float* out_xyz, int32_t cap) {
  if (n <= 0) return 0;
  const float inv_res = 1.0f / resolution;
  // table sized ~2x cap for low load factor
  int64_t table_size = 1;
  while (table_size < (int64_t)cap * 2) table_size <<= 1;
  const int64_t mask = table_size - 1;

  std::vector<int64_t> keys(table_size, INT64_MIN);
  std::vector<double> acc(table_size * 3, 0.0);
  std::vector<int32_t> counts(table_size, 0);

  int32_t n_voxels = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    const int64_t ix = (int64_t)std::floor(x * inv_res) + (1 << 20);
    const int64_t iy = (int64_t)std::floor(y * inv_res) + (1 << 20);
    const int64_t iz = (int64_t)std::floor(z * inv_res) + (1 << 20);
    const int64_t key = (ix << 42) | (iy << 21) | iz;
    // splitmix-style hash
    uint64_t h = (uint64_t)key;
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL; h ^= h >> 33;
    int64_t slot = (int64_t)(h & (uint64_t)mask);
    for (;;) {
      if (keys[slot] == key) break;
      if (keys[slot] == INT64_MIN) {
        if (n_voxels >= cap) return -1;
        keys[slot] = key;
        ++n_voxels;
        break;
      }
      slot = (slot + 1) & mask;
    }
    acc[3 * slot + 0] += x;
    acc[3 * slot + 1] += y;
    acc[3 * slot + 2] += z;
    counts[slot] += 1;
  }

  int32_t m = 0;
  for (int64_t s = 0; s < table_size && m < cap; ++s) {
    if (counts[s] == 0) continue;
    const double inv = 1.0 / counts[s];
    out_xyz[3 * m + 0] = (float)(acc[3 * s + 0] * inv);
    out_xyz[3 * m + 1] = (float)(acc[3 * s + 1] * inv);
    out_xyz[3 * m + 2] = (float)(acc[3 * s + 2] * inv);
    ++m;
  }
  return m;
}

// Band-pass distance filter (prefiltering_nodelet.cpp:164-180) fused with
// extraction-style compaction. Returns number of surviving points.
int distance_filter(const float* xyz, int64_t n, float near_thresh,
                    float far_thresh, float* out_xyz) {
  int64_t m = 0;
  const float near2 = near_thresh * near_thresh;
  const float far2 = far_thresh * far_thresh;
  for (int64_t i = 0; i < n; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    const float d2 = x * x + y * y + z * z;
    if (d2 > near2 && d2 < far2) {
      out_xyz[3 * m + 0] = x;
      out_xyz[3 * m + 1] = y;
      out_xyz[3 * m + 2] = z;
      ++m;
    }
  }
  return static_cast<int>(m);
}

}  // extern "C"
