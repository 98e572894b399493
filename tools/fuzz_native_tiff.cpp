// Mutation fuzzer for the sifsr native TIFF decoder: random byte flips,
// truncations and 4-byte splices over valid seeds; ASan flags any OOB.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>
extern "C" {
int sifsr_tiff_info(const char* path, int32_t* height, int32_t* width);
int sifsr_tiff_read_f32(const char* path, float* out, int64_t capacity);
}
static std::vector<uint8_t> slurp(const char* p) {
  FILE* f = fopen(p, "rb"); fseek(f, 0, SEEK_END); long n = ftell(f);
  fseek(f, 0, SEEK_SET); std::vector<uint8_t> v(n); fread(v.data(), 1, n, f);
  fclose(f); return v;
}
int main(int argc, char** argv) {
  std::mt19937 rng(strtoul(argv[1], nullptr, 10));
  std::vector<std::vector<uint8_t>> seeds;
  for (int i = 2; i < argc - 1; i++) seeds.push_back(slurp(argv[i]));
  const char* tmp = argv[argc - 1];
  const int ITERS = 10000;
  int rejected = 0, ok = 0;
  for (int it = 0; it < ITERS; it++) {
    if (it % 5000 == 0) fprintf(stderr, "it %d\n", it);
    std::vector<uint8_t> d = seeds[rng() % seeds.size()];
    int kind = rng() % 3;
    if (kind == 0) {                       // byte flips
      int flips = 1 + rng() % 8;
      for (int k = 0; k < flips; k++) d[rng() % d.size()] ^= 1 << (rng() % 8);
    } else if (kind == 1) {                // truncate
      d.resize(rng() % d.size());
    } else {                               // 4-byte splice of a wild value
      if (d.size() > 8) {
        uint32_t v = rng();
        size_t at = rng() % (d.size() - 4);
        memcpy(&d[at], &v, 4);
      }
    }
    FILE* f = fopen(tmp, "wb"); fwrite(d.data(), 1, d.size(), f); fclose(f);
    int32_t h = 0, w = 0;
    if (sifsr_tiff_info(tmp, &h, &w) != 0) { rejected++; continue; }
    if (h <= 0 || w <= 0 || (int64_t)h * w > (int64_t)1 << 28) { rejected++; continue; }
    std::vector<float> out((size_t)h * w);
    if (sifsr_tiff_read_f32(tmp, out.data(), (int64_t)out.size()) == 0) ok++;
    else rejected++;
  }
  printf("fuzz done: %d iters, %d decoded, %d rejected, 0 crashes\n", ITERS, ok, rejected);
  return 0;
}
