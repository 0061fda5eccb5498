// Native-tier benchmark (the RUN_CHOICE=0 comparison numbers for
// utils/perf-cmp; analog of the reference's google-benchmark suite running
// against the Intel HEXL CPU fallback).  Prints JSON lines.
//
//   ./hexl_tpu_bench [ntt|dyadic|keyswitch|all]

#include <chrono>
#include <cinttypes>
#include <cstdio>
#include <cstring>
#include <functional>
#include <random>
#include <string>
#include <vector>

#include "../include/hexl-fpga.h"
#include "../src/compute.hpp"
#include "../src/number_theory.hpp"

using hexl_tpu::u64;
using Clock = std::chrono::steady_clock;

static double Time(const std::function<void()>& fn, int iters) {
  fn();  // warmup
  auto t0 = Clock::now();
  for (int i = 0; i < iters; ++i) fn();
  return std::chrono::duration<double>(Clock::now() - t0).count() / iters;
}

static void BenchNtt() {
  const u64 n = 16384;
  const u64 q = hexl_tpu::generate_primes(1, 51, n)[0];
  auto t = hexl_tpu::make_ntt_tables(n, q);
  std::mt19937_64 rng(0);
  std::vector<u64> x(n);
  for (auto& v : x) v = rng() % q;
  double dt = Time(
      [&] {
        hexl_tpu::fwd_ntt(x.data(), n, q, t.fwd.data(), t.fwd_precon.data());
      },
      50);
  std::printf(
      "{\"metric\": \"native_fwd_ntt\", \"value\": %.1f, \"unit\": "
      "\"NTT/s\", \"n\": %" PRIu64 "}\n",
      1.0 / dt, n);
}

static void BenchDyadic() {
  const u64 n = 16384, M = 14;
  auto primes = hexl_tpu::generate_primes(static_cast<int>(M), 50, n);
  std::mt19937_64 rng(0);
  std::vector<u64> op1(2 * M * n), op2(2 * M * n), out(3 * M * n);
  for (u64 i = 0; i < op1.size(); ++i) {
    const u64 q = primes[(i / n) % M];
    op1[i] = rng() % q;
    op2[i] = rng() % q;
  }
  double dt = Time(
      [&] {
        hexl_tpu::dyadic_multiply(out.data(), op1.data(), op2.data(), n,
                                  primes.data(), M);
      },
      10);
  std::printf(
      "{\"metric\": \"native_dyadic_multiply\", \"value\": %.1f, \"unit\": "
      "\"op/s\", \"n\": %" PRIu64 ", \"n_moduli\": %" PRIu64 "}\n",
      1.0 / dt, n, M);
}

static void BenchKeySwitch() {
  const u64 n = 16384, L = 6, K = 7;
  auto primes = hexl_tpu::generate_primes(static_cast<int>(K), 51, n);
  std::vector<hexl_tpu::NttTables> tabs;
  for (u64 q : primes) tabs.push_back(hexl_tpu::make_ntt_tables(n, q));
  std::mt19937_64 rng(0);
  std::vector<u64> t_target(L * n), result(2 * L * n, 0), msf(K, 1);
  for (u64 i = 0; i < L; ++i)
    for (u64 j = 0; j < n; ++j) t_target[i * n + j] = rng() % primes[i];
  std::vector<std::vector<u64>> keys(L, std::vector<u64>(2 * K * n));
  std::vector<const u64*> key_ptrs;
  for (u64 i = 0; i < L; ++i) {
    for (u64 c = 0; c < 2 * K * n; ++c)
      keys[i][c] = rng() % primes[(c / n) % K];
    key_ptrs.push_back(keys[i].data());
  }
  double dt = Time(
      [&] {
        hexl_tpu::keyswitch(result.data(), t_target.data(), n, L, K, 2,
                            primes.data(), key_ptrs.data(), msf.data(),
                            tabs.data());
      },
      3);
  std::printf(
      "{\"metric\": \"native_keyswitch\", \"value\": %.2f, \"unit\": "
      "\"op/s\", \"config\": \"%" PRIu64 "_%" PRIu64 "_%" PRIu64 "_7_2\"}\n",
      1.0 / dt, n, L, K);
}

int main(int argc, char** argv) {
  const std::string which = argc > 1 ? argv[1] : "all";
  if (which == "ntt" || which == "all") BenchNtt();
  if (which == "dyadic" || which == "all") BenchDyadic();
  if (which == "keyswitch" || which == "all") BenchKeySwitch();
  return 0;
}
