// Native dataset decoder for malio_tpu: the runtime replacement for the
// reference's Qt file_player decode threads (file_player/src/ROSThread.cpp
// record layouts), exposed as a C ABI for ctypes.
//
// Record formats (little-endian, packed):
//   ouster:   x,y,z f32 | intensity f32 | ring u16 | t u32(ns)      (22 B)
//   livox:    x,y,z f32 | refl u8 | tag u8 | line u8 | offset u32   (19 B)
//   velodyne: x,y,z f32 | intensity f32 | ring u16 | time f32(s)    (22 B)
//
// decode_* fill a caller-provided (cap, 4) float64 buffer with
// [x, y, z, t_seconds_rel] after applying the reference's preprocess
// filters (decimation, blind range, Livox tag/line gates, ms conversion;
// preprocess.cpp:59-212) and return the point count written (or -1 on
// IO error). duration_out receives the scan duration in seconds.
//
// batch_decode runs a pool of worker threads over a file list — the
// replacement for the per-sensor reader threads + prefetch of the
// file player (ROSThread.cpp:586-1005).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct OusterRec {
  float x, y, z, intensity;
  uint16_t ring;
  uint32_t t;
};
struct LivoxRec {
  float x, y, z;
  uint8_t reflectivity, tag, line;
  uint32_t offset_time;
};
struct VelodyneRec {
  float x, y, z, intensity;
  uint16_t ring;
  float time;
};
#pragma pack(pop)

static_assert(sizeof(OusterRec) == 22, "ouster record must be 22 bytes");
static_assert(sizeof(LivoxRec) == 19, "livox record must be 19 bytes");
static_assert(sizeof(VelodyneRec) == 22, "velodyne record must be 22 bytes");

template <typename Rec>
long read_records(const char* path, std::vector<Rec>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  long n = bytes / (long)sizeof(Rec);
  out.resize(n);
  long got = (long)std::fread(out.data(), sizeof(Rec), n, f);
  std::fclose(f);
  return got;
}

}  // namespace

extern "C" {

long decode_ouster(const char* path, long point_filter_num, double blind,
                   double time_unit_scale, double* out_xyzt, long cap,
                   double* duration_out) {
  std::vector<OusterRec> recs;
  long n = read_records(path, recs);
  if (n < 0) return -1;
  const double b2 = blind * blind;
  long m = 0;
  double max_t = 0.0;
  for (long i = 0; i < n && m < cap; ++i) {
    if (point_filter_num > 1 && (i % point_filter_num) != 0) continue;
    const OusterRec& r = recs[i];
    const double r2 = (double)r.x * r.x + (double)r.y * r.y + (double)r.z * r.z;
    if (r2 < b2) continue;
    const double t_s = (double)r.t * time_unit_scale * 1e-12;  // ns->ms->s
    if (t_s > max_t) max_t = t_s;
    out_xyzt[m * 4 + 0] = r.x;
    out_xyzt[m * 4 + 1] = r.y;
    out_xyzt[m * 4 + 2] = r.z;
    out_xyzt[m * 4 + 3] = t_s;
    ++m;
  }
  if (duration_out) *duration_out = max_t;
  return m;
}

long decode_livox(const char* path, long point_filter_num, long n_scans,
                  double blind, double* out_xyzt, long cap,
                  double* duration_out) {
  std::vector<LivoxRec> recs;
  long n = read_records(path, recs);
  if (n < 0) return -1;
  const double b2 = blind * blind;
  long m = 0, valid_num = 0;
  double max_t = 0.0;
  float px = 0.f, py = 0.f, pz = 0.f;
  for (long i = 1; i < n && m < cap; ++i) {
    const LivoxRec& r = recs[i];
    const unsigned tagbits = r.tag & 0x30;
    if (r.line >= n_scans || (tagbits != 0x10 && tagbits != 0x00)) continue;
    ++valid_num;
    if (point_filter_num > 1 && (valid_num % point_filter_num) != 0) continue;
    const double t_ms = (double)r.offset_time / 1e6;
    if (t_ms > 100.0) continue;
    const LivoxRec& p = recs[i - 1];
    const bool moved = std::abs(r.x - p.x) > 1e-7f || std::abs(r.y - p.y) > 1e-7f ||
                       std::abs(r.z - p.z) > 1e-7f;
    const double r2 = (double)r.x * r.x + (double)r.y * r.y + (double)r.z * r.z;
    if (!moved || r2 <= b2) continue;
    if (t_ms / 1e3 > max_t) max_t = t_ms / 1e3;
    out_xyzt[m * 4 + 0] = r.x;
    out_xyzt[m * 4 + 1] = r.y;
    out_xyzt[m * 4 + 2] = r.z;
    out_xyzt[m * 4 + 3] = t_ms / 1e3;
    ++m;
    px = r.x; py = r.y; pz = r.z;
    (void)px; (void)py; (void)pz;
  }
  if (duration_out) *duration_out = max_t;
  return m;
}

long decode_velodyne(const char* path, long point_filter_num, double blind,
                     double time_unit_scale, double* out_xyzt, long cap,
                     double* duration_out) {
  std::vector<VelodyneRec> recs;
  long n = read_records(path, recs);
  if (n < 0) return -1;
  const double b2 = blind * blind;
  long m = 0;
  double max_t = 0.0;
  for (long i = 0; i < n && m < cap; ++i) {
    if (point_filter_num > 1 && (i % point_filter_num) != 0) continue;
    const VelodyneRec& r = recs[i];
    const double r2 = (double)r.x * r.x + (double)r.y * r.y + (double)r.z * r.z;
    if (r2 <= b2) continue;
    const double t_s = (double)r.time * time_unit_scale / 1e3;  // ->ms->s
    if (t_s > max_t) max_t = t_s;
    out_xyzt[m * 4 + 0] = r.x;
    out_xyzt[m * 4 + 1] = r.y;
    out_xyzt[m * 4 + 2] = r.z;
    out_xyzt[m * 4 + 3] = t_s;
    ++m;
  }
  if (duration_out) *duration_out = max_t;
  return m;
}

// sensor_type: 0=ouster 1=livox 2=velodyne
// paths: concatenated null-terminated strings, n_files of them.
// out: (n_files, cap, 4) float64; counts/durations: (n_files,)
long batch_decode(const char* paths, long n_files, long sensor_type,
                  long point_filter_num, long n_scans, double blind,
                  double time_unit_scale, double* out, long cap,
                  long* counts, double* durations, long n_threads) {
  std::vector<const char*> files(n_files);
  const char* p = paths;
  for (long i = 0; i < n_files; ++i) {
    files[i] = p;
    p += std::strlen(p) + 1;
  }
  std::atomic<long> next(0);
  std::atomic<long> errors(0);
  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n_files) return;
      double* dst = out + (size_t)i * cap * 4;
      long c = -1;
      switch (sensor_type) {
        case 0:
          c = decode_ouster(files[i], point_filter_num, blind, time_unit_scale,
                            dst, cap, &durations[i]);
          break;
        case 1:
          c = decode_livox(files[i], point_filter_num, n_scans, blind, dst, cap,
                           &durations[i]);
          break;
        case 2:
          c = decode_velodyne(files[i], point_filter_num, blind, time_unit_scale,
                              dst, cap, &durations[i]);
          break;
      }
      counts[i] = c;
      if (c < 0) errors.fetch_add(1);
    }
  };
  long nt = n_threads > 0 ? n_threads : (long)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::vector<std::thread> pool;
  for (long t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return -errors.load();
}

}  // extern "C"
