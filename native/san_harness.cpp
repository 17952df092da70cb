// Sanitizer harness for the native decoder (SURVEY §5 "sanitizers for
// host code"): generates synthetic sensor files of every record type,
// then hammers batch_decode with an oversubscribed thread pool. Built
// with -fsanitize=thread or -fsanitize=address (Makefile targets
// san_tsan / san_asan) and run by tests/test_native_decoder.py — any
// data race on the shared out/counts/durations buffers or heap error
// in the record readers fails the run.
//
// Usage: san_harness <scratch-dir>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" long batch_decode(const char* paths, long n_files, long sensor_type,
                             long point_filter_num, long n_scans, double blind,
                             double time_unit_scale, double* out, long cap,
                             long* counts, double* durations, long n_threads);

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

std::mt19937 rng(42);

template <typename Rec, typename Fill>
std::string write_file(const std::string& dir, const char* name, long n,
                       Fill fill) {
  std::string path = dir + "/" + name;
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) {
    std::fprintf(stderr, "cannot write %s\n", path.c_str());
    std::exit(2);
  }
  std::vector<Rec> recs(n);
  for (long i = 0; i < n; ++i) fill(recs[i], i);
  std::fwrite(recs.data(), sizeof(Rec), n, f);
  std::fclose(f);
  return path;
}

int run_batch(const std::vector<std::string>& files, long sensor_type,
              long n_scans, long cap) {
  std::string blob;
  for (const auto& f : files) {
    blob += f;
    blob.push_back('\0');
  }
  const long nf = (long)files.size();
  std::vector<double> out((size_t)nf * cap * 4);
  std::vector<long> counts(nf);
  std::vector<double> durations(nf);
  // oversubscribe: more threads than files AND than cores
  long err = batch_decode(blob.data(), nf, sensor_type, 2, n_scans, 0.5, 1.0,
                          out.data(), cap, counts.data(), durations.data(),
                          16);
  if (err != 0) return 1;
  for (long i = 0; i < nf; ++i)
    if (counts[i] < 0) return 1;
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: san_harness <scratch-dir>\n");
    return 2;
  }
  const std::string dir = argv[1];
  std::uniform_real_distribution<float> coord(-30.f, 30.f);

  std::vector<std::string> ouster, livox, velo;
  for (int k = 0; k < 24; ++k) {
    char name[64];
    std::snprintf(name, sizeof(name), "o%02d.bin", k);
    ouster.push_back(write_file<OusterRec>(dir, name, 4000,
        [&](OusterRec& r, long i) {
          r.x = coord(rng); r.y = coord(rng); r.z = coord(rng);
          r.intensity = 1.f; r.ring = (uint16_t)(i % 128);
          r.t = (uint32_t)(i * 25000);
        }));
    std::snprintf(name, sizeof(name), "l%02d.bin", k);
    livox.push_back(write_file<LivoxRec>(dir, name, 4000,
        [&](LivoxRec& r, long i) {
          r.x = coord(rng); r.y = coord(rng); r.z = coord(rng);
          r.reflectivity = 10; r.tag = (i % 7 == 0) ? 0x20 : 0x10;
          r.line = (uint8_t)(i % 8); r.offset_time = (uint32_t)(i * 25000);
        }));
    std::snprintf(name, sizeof(name), "v%02d.bin", k);
    velo.push_back(write_file<VelodyneRec>(dir, name, 4000,
        [&](VelodyneRec& r, long i) {
          r.x = coord(rng); r.y = coord(rng); r.z = coord(rng);
          r.intensity = 1.f; r.ring = (uint16_t)(i % 16);
          r.time = (float)i * 25e-6f;
        }));
  }

  int rc = 0;
  for (int rep = 0; rep < 4; ++rep) {
    rc |= run_batch(ouster, 0, 128, 3000);
    rc |= run_batch(livox, 1, 8, 3000);
    rc |= run_batch(velo, 2, 16, 3000);
  }
  // error path: nonexistent files must report cleanly from every worker
  std::vector<std::string> missing;
  for (int k = 0; k < 8; ++k) missing.push_back(dir + "/does_not_exist_" +
                                                std::to_string(k) + ".bin");
  if (run_batch(missing, 0, 128, 64) == 0) rc |= 1;  // must fail
  std::printf(rc ? "san_harness FAILED\n" : "san_harness OK\n");
  return rc;
}
