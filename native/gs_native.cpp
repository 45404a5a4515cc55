// gs_native: native data-plane for the TPU 3DGS framework.
//
// The compute path is JAX/Pallas; this library is the host-side runtime
// counterpart (the role C++/CUDA host code plays in the reference build):
// high-throughput parsers/writers for the on-disk formats the framework
// touches every run:
//
//   - COLMAP sparse reconstruction binaries (cameras.bin / images.bin /
//     points3D.bin) — layouts per the public COLMAP format (the same ones
//     scene/colmap_loader.py parses record-by-record in the reference).
//   - Gaussian-splat binary PLY snapshots (the 3DGS ecosystem interchange
//     format; schema per reference gaussian_model.py:218-258): bulk
//     float32 row I/O instead of per-property python loops.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment). All
// multi-byte values are little-endian (COLMAP/PLY on-disk convention; this
// library assumes a little-endian host).
//
// Error protocol: functions return 0 on success, negative on failure.
// Count/query functions return the count (>= 0) or negative on failure.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct File {
  FILE* f = nullptr;
  explicit File(const char* path, const char* mode) { f = fopen(path, mode); }
  ~File() {
    if (f) fclose(f);
  }
  bool ok() const { return f != nullptr; }
  bool read(void* dst, size_t n) { return fread(dst, 1, n, f) == n; }
  bool write(const void* src, size_t n) { return fwrite(src, 1, n, f) == n; }
  bool skip(int64_t n) { return fseek(f, n, SEEK_CUR) == 0; }
};

// COLMAP camera model id -> parameter count (public COLMAP format).
int camera_model_num_params(int model_id) {
  static const int kNum[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  if (model_id < 0 || model_id > 10) return -1;
  return kNum[model_id];
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// COLMAP points3D.bin
// record: point_id u64 | xyz 3xf64 | rgb 3xu8 | error f64 |
//         track_len u64 | track 2xu32 * track_len
// ---------------------------------------------------------------------------

int64_t gs_colmap_points3d_count(const char* path) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  uint64_t n = 0;
  if (!file.read(&n, 8)) return -2;
  return static_cast<int64_t>(n);
}

int gs_colmap_read_points3d(const char* path, int64_t n, double* xyz,
                            uint8_t* rgb, double* err) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  uint64_t count = 0;
  if (!file.read(&count, 8)) return -2;
  if (static_cast<int64_t>(count) != n) return -3;
  for (int64_t i = 0; i < n; ++i) {
    struct __attribute__((packed)) {
      uint64_t id;
      double xyz[3];
      uint8_t rgb[3];
      double error;
      uint64_t track_len;
    } rec;
    static_assert(sizeof(rec) == 8 + 24 + 3 + 8 + 8, "packing");
    if (!file.read(&rec, sizeof(rec))) return -4;
    memcpy(xyz + 3 * i, rec.xyz, 24);
    memcpy(rgb + 3 * i, rec.rgb, 3);
    err[i] = rec.error;
    if (!file.skip(8 * static_cast<int64_t>(rec.track_len))) return -5;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP images.bin
// record: image_id i32 | qvec 4xf64 | tvec 3xf64 | camera_id i32 |
//         name \0-terminated | n_points2d u64 | (x f64, y f64, id u64) * n
// Names are returned concatenated with '\0' separators in name_buf.
// ---------------------------------------------------------------------------

int64_t gs_colmap_images_count(const char* path) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  uint64_t n = 0;
  if (!file.read(&n, 8)) return -2;
  return static_cast<int64_t>(n);
}

int gs_colmap_read_images(const char* path, int64_t n, int32_t* image_ids,
                          double* qvecs, double* tvecs, int32_t* camera_ids,
                          char* name_buf, int64_t name_buf_len) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  uint64_t count = 0;
  if (!file.read(&count, 8)) return -2;
  if (static_cast<int64_t>(count) != n) return -3;
  int64_t name_pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!file.read(image_ids + i, 4)) return -4;
    if (!file.read(qvecs + 4 * i, 32)) return -4;
    if (!file.read(tvecs + 3 * i, 24)) return -4;
    if (!file.read(camera_ids + i, 4)) return -4;
    for (;;) {
      int c = fgetc(file.f);
      if (c == EOF) return -5;
      if (name_pos >= name_buf_len) return -6;
      name_buf[name_pos++] = static_cast<char>(c);
      if (c == 0) break;
    }
    uint64_t n2d = 0;
    if (!file.read(&n2d, 8)) return -4;
    if (!file.skip(24 * static_cast<int64_t>(n2d))) return -5;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP cameras.bin
// record: camera_id i32 | model_id i32 | width u64 | height u64 |
//         params f64 * num_params(model)
// params are written into a fixed [n,12] matrix (max model param count).
// ---------------------------------------------------------------------------

int64_t gs_colmap_cameras_count(const char* path) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  uint64_t n = 0;
  if (!file.read(&n, 8)) return -2;
  return static_cast<int64_t>(n);
}

int gs_colmap_read_cameras(const char* path, int64_t n, int32_t* camera_ids,
                           int32_t* model_ids, int64_t* widths,
                           int64_t* heights, double* params /*[n,12]*/,
                           int32_t* num_params) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  uint64_t count = 0;
  if (!file.read(&count, 8)) return -2;
  if (static_cast<int64_t>(count) != n) return -3;
  for (int64_t i = 0; i < n; ++i) {
    if (!file.read(camera_ids + i, 4)) return -4;
    if (!file.read(model_ids + i, 4)) return -4;
    uint64_t w = 0, h = 0;
    if (!file.read(&w, 8) || !file.read(&h, 8)) return -4;
    widths[i] = static_cast<int64_t>(w);
    heights[i] = static_cast<int64_t>(h);
    int np = camera_model_num_params(model_ids[i]);
    if (np < 0) return -7;
    num_params[i] = np;
    if (!file.read(params + 12 * i, 8 * np)) return -4;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Gaussian binary PLY (all-float32 vertex properties, as written by this
// framework and the reference's save_ply)
// ---------------------------------------------------------------------------

// Parses the header. Returns header byte length (>0) on success; fills
// n_verts and n_props; property names are concatenated \0-separated into
// prop_buf. Requires format binary_little_endian and all-f4 properties.
int64_t gs_ply_header(const char* path, int64_t* n_verts, int64_t* n_props,
                      char* prop_buf, int64_t prop_buf_len) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  char line[512];
  int64_t header_len = 0;
  *n_verts = 0;
  *n_props = 0;
  int64_t prop_pos = 0;
  bool binary_le = false;
  if (!fgets(line, sizeof(line), file.f) || strncmp(line, "ply", 3) != 0)
    return -2;
  header_len += static_cast<int64_t>(strlen(line));
  for (;;) {
    if (!fgets(line, sizeof(line), file.f)) return -3;
    header_len += static_cast<int64_t>(strlen(line));
    if (strncmp(line, "end_header", 10) == 0) break;
    if (strncmp(line, "format binary_little_endian", 27) == 0) {
      binary_le = true;
    } else if (strncmp(line, "element vertex ", 15) == 0) {
      *n_verts = strtoll(line + 15, nullptr, 10);
    } else if (strncmp(line, "property ", 9) == 0) {
      char type[32], name[128];
      if (sscanf(line + 9, "%31s %127s", type, name) != 2) return -4;
      if (strcmp(type, "float") != 0 && strcmp(type, "float32") != 0)
        return -5;  // fast path handles all-f4 schemas only
      size_t len = strlen(name) + 1;
      if (prop_pos + static_cast<int64_t>(len) > prop_buf_len) return -6;
      memcpy(prop_buf + prop_pos, name, len);
      prop_pos += static_cast<int64_t>(len);
      ++*n_props;
    }
  }
  if (!binary_le) return -7;
  return header_len;
}

// Bulk-reads the vertex block as an [n_verts, n_props] f32 matrix.
int gs_ply_read_f32(const char* path, int64_t header_len, int64_t n_verts,
                    int64_t n_props, float* out) {
  File file(path, "rb");
  if (!file.ok()) return -1;
  if (fseek(file.f, header_len, SEEK_SET) != 0) return -2;
  size_t total = static_cast<size_t>(n_verts) * n_props * 4;
  if (!file.read(out, total)) return -3;
  return 0;
}

// Writes a gaussian PLY: header with the given \0-separated property names
// followed by the [n_verts, n_props] f32 matrix in one bulk write.
int gs_ply_write_f32(const char* path, int64_t n_verts, int64_t n_props,
                     const char* prop_names /* \0-separated */,
                     const float* data) {
  File file(path, "wb");
  if (!file.ok()) return -1;
  std::string header = "ply\nformat binary_little_endian 1.0\n";
  header += "element vertex " + std::to_string(n_verts) + "\n";
  const char* p = prop_names;
  for (int64_t i = 0; i < n_props; ++i) {
    header += "property float ";
    header += p;
    header += "\n";
    p += strlen(p) + 1;
  }
  header += "end_header\n";
  if (!file.write(header.data(), header.size())) return -2;
  if (!file.write(data, static_cast<size_t>(n_verts) * n_props * 4)) return -3;
  return 0;
}

}  // extern "C"
