// Native runtime kernels for SDP-GS-TPU: the host-side analogues of the
// reference's C++/CUDA support code (simple-knn, cub utilities, open3d
// post-processing). The TPU compute path is Pallas; these cover the
// IO/geometry host paths that are too slow in Python at production scale:
//
//  - colmap_points3d_*: COLMAP points3D.bin parsing incl. per-image track
//    observations (reference/scene/colmap_loader.py:156-248 loops per
//    point in Python; this streams the file once).
//  - voxel_downsample: hash-grid average pooling of a point cloud
//    (replaces the reference's open3d uniform_down_sample,
//    depthfusion.py:400-409).
//  - connected_components: 4-connected grid labeling used by the
//    segment-alignment fallback (reference conclude.py:117-126 uses
//    cv2.connectedComponentsWithStats).
//
// Build: native/build.sh -> libsdpgs_io.so ; bound via ctypes
// (sdpgs_tpu/native/__init__.py) with pure-Python fallbacks.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- COLMAP --
// Returns the number of points, or -1 on error.
long long colmap_points3d_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  size_t got = fread(&n, 8, 1, f);
  fclose(f);
  return got == 1 ? (long long)n : -1;
}

// Parses points3D.bin. xyz:[n*3] rgb:[n*3] err:[n]. If img_ids/np_obs are
// non-null, also collects (point_idx, image_id, kp_idx) observation triples
// up to max_obs. Returns points parsed, or -1 on error; *n_obs_out receives
// the observation count (clamped).
long long colmap_points3d_parse(const char* path, double* xyz, double* rgb,
                                double* err, long long max_points,
                                long long* obs, long long max_obs,
                                long long* n_obs_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  if ((long long)n > max_points) n = (uint64_t)max_points;
  long long n_obs = 0;
  std::vector<int32_t> track;
  for (uint64_t i = 0; i < n; i++) {
    uint64_t pid;
    double p[3], e;
    uint8_t c[3];
    if (fread(&pid, 8, 1, f) != 1) { fclose(f); return -1; }
    if (fread(p, 8, 3, f) != 3) { fclose(f); return -1; }
    if (fread(c, 1, 3, f) != 3) { fclose(f); return -1; }
    if (fread(&e, 8, 1, f) != 1) { fclose(f); return -1; }
    uint64_t track_len;
    if (fread(&track_len, 8, 1, f) != 1) { fclose(f); return -1; }
    memcpy(xyz + 3 * i, p, 24);
    rgb[3 * i] = c[0]; rgb[3 * i + 1] = c[1]; rgb[3 * i + 2] = c[2];
    err[i] = e;
    if (obs) {
      track.resize(track_len * 2);
      if (track_len && fread(track.data(), 4, track_len * 2, f) != track_len * 2) {
        fclose(f); return -1;
      }
      for (uint64_t t = 0; t < track_len && n_obs < max_obs; t++) {
        obs[3 * n_obs] = (long long)i;
        obs[3 * n_obs + 1] = track[2 * t];
        obs[3 * n_obs + 2] = track[2 * t + 1];
        n_obs++;
      }
    } else {
      fseek(f, (long)(8 * track_len), SEEK_CUR);
    }
  }
  if (n_obs_out) *n_obs_out = n_obs;
  fclose(f);
  return (long long)n;
}

// ---------------------------------------------------- voxel downsample ----
// In: points [n,3] f32, colors [n,3] f32, voxel size. Out buffers sized n.
// Returns number of output voxels.
long long voxel_downsample(const float* points, const float* colors,
                           long long n, float voxel, float* out_points,
                           float* out_colors) {
  struct Acc { double p[3]; double c[3]; long long cnt; };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve((size_t)n);
  const double inv = 1.0 / voxel;
  for (long long i = 0; i < n; i++) {
    int64_t qx = (int64_t)std::floor(points[3 * i] * inv) + (1 << 20);
    int64_t qy = (int64_t)std::floor(points[3 * i + 1] * inv) + (1 << 20);
    int64_t qz = (int64_t)std::floor(points[3 * i + 2] * inv) + (1 << 20);
    uint64_t key = ((uint64_t)qx << 42) ^ ((uint64_t)qy << 21) ^ (uint64_t)qz;
    Acc& a = cells[key];
    for (int k = 0; k < 3; k++) {
      a.p[k] += points[3 * i + k];
      a.c[k] += colors[3 * i + k];
    }
    a.cnt++;
  }
  long long m = 0;
  for (auto& kv : cells) {
    for (int k = 0; k < 3; k++) {
      out_points[3 * m + k] = (float)(kv.second.p[k] / kv.second.cnt);
      out_colors[3 * m + k] = (float)(kv.second.c[k] / kv.second.cnt);
    }
    m++;
  }
  return m;
}

// ------------------------------------------------- connected components ---
// 4-connected labeling of a uint8 mask [h, w]; labels out int32 (0 =
// background, components numbered from 1). Returns component count.
int connected_components(const uint8_t* mask, int h, int w, int32_t* labels) {
  memset(labels, 0, sizeof(int32_t) * (size_t)h * w);
  std::vector<int> stack;
  int cur = 0;
  for (int sy = 0; sy < h; sy++) {
    for (int sx = 0; sx < w; sx++) {
      int s = sy * w + sx;
      if (!mask[s] || labels[s]) continue;
      cur++;
      labels[s] = cur;
      stack.push_back(s);
      while (!stack.empty()) {
        int p = stack.back();
        stack.pop_back();
        int y = p / w, x = p % w;
        const int ns[4] = {p - w, p + w, p - 1, p + 1};
        const bool ok[4] = {y > 0, y < h - 1, x > 0, x < w - 1};
        for (int k = 0; k < 4; k++) {
          if (ok[k] && mask[ns[k]] && !labels[ns[k]]) {
            labels[ns[k]] = cur;
            stack.push_back(ns[k]);
          }
        }
      }
    }
  }
  return cur;
}

}  // extern "C"
