// Standalone C++ dyadic-multiply demo against libhexl_fpga_tpu (the analog
// of the reference's examples/example.cpp): async enqueue, complete, verify.
//
// Build:
//   cmake -S . -B build && cmake --build build && ./build/example

#include <hexl-fpga.h>

#include <cinttypes>
#include <cstdio>
#include <random>
#include <vector>

int main() {
  const uint64_t n = 4096, n_moduli = 3, worksize = 4;
  std::vector<uint64_t> moduli = {
      (uint64_t(1) << 48) + 0x4001, (uint64_t(1) << 48) + 0xa001,
      (uint64_t(1) << 48) + 0x1c001};

  intel::hexl::acquire_FPGA_resources();
  std::printf("dyadic multiply: n=%" PRIu64 ", %" PRIu64
              " moduli, worksize=%" PRIu64 "\n",
              n, n_moduli, worksize);

  std::mt19937_64 rng(0);
  std::vector<std::vector<uint64_t>> op1s, op2s, outs;
  intel::hexl::set_worksize_DyadicMultiply(worksize);
  for (uint64_t w = 0; w < worksize; ++w) {
    std::vector<uint64_t> op1(2 * n_moduli * n), op2(2 * n_moduli * n),
        out(3 * n_moduli * n, 0);
    for (uint64_t i = 0; i < op1.size(); ++i) {
      const uint64_t q = moduli[(i / n) % n_moduli];
      op1[i] = rng() % q;
      op2[i] = rng() % q;
    }
    op1s.push_back(std::move(op1));
    op2s.push_back(std::move(op2));
    outs.push_back(std::move(out));
    intel::hexl::DyadicMultiply(outs[w].data(), op1s[w].data(), op2s[w].data(),
                                n, moduli.data(), n_moduli);
  }
  intel::hexl::DyadicMultiplyCompleted();

  for (uint64_t w = 0; w < worksize; ++w) {
    for (uint64_t m = 0; m < n_moduli; ++m) {
      const unsigned __int128 q = moduli[m];
      for (uint64_t j = 0; j < n; ++j) {
        const uint64_t x0 = op1s[w][m * n + j];
        const uint64_t x1 = op1s[w][(n_moduli + m) * n + j];
        const uint64_t y0 = op2s[w][m * n + j];
        const uint64_t y1 = op2s[w][(n_moduli + m) * n + j];
        const uint64_t e0 = (unsigned __int128)x0 * y0 % q;
        const uint64_t e1 =
            ((unsigned __int128)x0 * y1 + (unsigned __int128)x1 * y0) % q;
        const uint64_t e2 = (unsigned __int128)x1 * y1 % q;
        if (outs[w][m * n + j] != e0 ||
            outs[w][(n_moduli + m) * n + j] != e1 ||
            outs[w][(2 * n_moduli + m) * n + j] != e2) {
          std::printf("MISMATCH at job %" PRIu64 "\n", w);
          return 1;
        }
      }
    }
    std::printf("job %" PRIu64 ": verified OK\n", w);
  }
  intel::hexl::release_FPGA_resources();
  std::puts("all results validated");
  return 0;
}
