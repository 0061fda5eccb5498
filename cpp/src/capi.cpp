// Flat extern "C" surface over the C++ API (include/hexl-fpga.h), so the
// Python bridge (hexl_fpga_tpu/cpp_bridge.py) can drive the native runtime
// through ctypes without dealing with C++ name mangling.  One-to-one with
// the 14 public functions, plus number-theory helpers used by tests.

#include <cstddef>
#include <cstdint>

#include "../include/hexl-fpga.h"
#include "number_theory.hpp"

extern "C" {

void hexl_tpu_acquire() { intel::hexl::acquire_FPGA_resources(); }
void hexl_tpu_release() { intel::hexl::release_FPGA_resources(); }

void hexl_tpu_set_worksize_dyadic_multiply(uint64_t ws) {
  intel::hexl::set_worksize_DyadicMultiply(ws);
}

void hexl_tpu_dyadic_multiply(uint64_t* results, const uint64_t* op1,
                              const uint64_t* op2, uint64_t n,
                              const uint64_t* moduli, uint64_t n_moduli) {
  intel::hexl::DyadicMultiply(results, op1, op2, n, moduli, n_moduli);
}

int hexl_tpu_dyadic_multiply_completed() {
  return intel::hexl::DyadicMultiplyCompleted() ? 1 : 0;
}

void hexl_tpu_set_worksize_keyswitch(uint64_t ws) {
  intel::hexl::set_worksize_KeySwitch(ws);
}

void hexl_tpu_keyswitch(uint64_t* result, const uint64_t* t_target, uint64_t n,
                        uint64_t decomp_modulus_size,
                        uint64_t key_modulus_size, uint64_t rns_modulus_size,
                        uint64_t key_component_count, const uint64_t* moduli,
                        const uint64_t** k_switch_keys,
                        const uint64_t* modswitch_factors,
                        const uint64_t* twiddle_factors) {
  intel::hexl::KeySwitch(result, t_target, n, decomp_modulus_size,
                         key_modulus_size, rns_modulus_size,
                         key_component_count, moduli, k_switch_keys,
                         modswitch_factors, twiddle_factors);
}

int hexl_tpu_keyswitch_completed() {
  return intel::hexl::KeySwitchCompleted() ? 1 : 0;
}

#pragma GCC diagnostic push
#pragma GCC diagnostic ignored "-Wdeprecated-declarations"

void hexl_tpu_set_worksize_ntt(uint64_t ws) {
  intel::hexl::_set_worksize_NTT(ws);
}

void hexl_tpu_ntt(uint64_t* operand, const uint64_t* roots,
                  const uint64_t* precon, uint64_t q, uint64_t n) {
  intel::hexl::_NTT(operand, roots, precon, q, n);
}

int hexl_tpu_ntt_completed() { return intel::hexl::_NTTCompleted() ? 1 : 0; }

void hexl_tpu_set_worksize_intt(uint64_t ws) {
  intel::hexl::_set_worksize_INTT(ws);
}

void hexl_tpu_intt(uint64_t* operand, const uint64_t* inv_roots,
                   const uint64_t* precon, uint64_t q, uint64_t inv_n,
                   uint64_t inv_n_w, uint64_t n) {
  intel::hexl::_INTT(operand, inv_roots, precon, q, inv_n, inv_n_w, n);
}

int hexl_tpu_intt_completed() { return intel::hexl::_INTTCompleted() ? 1 : 0; }

#pragma GCC diagnostic pop

// ---- number-theory helpers (cross-validated against the Python layer) ----

uint64_t hexl_tpu_minimal_primitive_root(uint64_t degree, uint64_t q) {
  return hexl_tpu::minimal_primitive_root(degree, q);
}

// Fill caller buffers (each of size n) with the golden-layout tables.
void hexl_tpu_make_ntt_tables(uint64_t n, uint64_t q, uint64_t* fwd,
                              uint64_t* fwd_precon, uint64_t* inv,
                              uint64_t* inv_precon, uint64_t* inv_n,
                              uint64_t* inv_n_w) {
  hexl_tpu::NttTables t = hexl_tpu::make_ntt_tables(n, q);
  for (uint64_t i = 0; i < n; ++i) {
    fwd[i] = t.fwd[i];
    fwd_precon[i] = t.fwd_precon[i];
    inv[i] = t.inv[i];
    inv_precon[i] = t.inv_precon[i];
  }
  *inv_n = t.inv_n;
  *inv_n_w = t.inv_n_w;
}

int hexl_tpu_generate_primes(int num_primes, int bit_size, uint64_t ntt_size,
                             uint64_t* out) {
  try {
    auto p = hexl_tpu::generate_primes(num_primes, bit_size, ntt_size);
    for (std::size_t i = 0; i < p.size(); ++i) out[i] = p[i];
    return static_cast<int>(p.size());
  } catch (...) {
    return 0;
  }
}

// -- 52-bit wire transport codec --------------------------------------------
//
// Packs n (multiple of 8) sub-2^52 values into a dense 52-bit stream
// (13 u32 words per 8 values) at memory bandwidth -- the Python wirepack
// codec's numpy fallback costs more host CPU than the wire bytes it saves,
// so link-bound transports call these through ctypes instead.  Bit layout
// identical to hexl_fpga_tpu/ops/wirepack.py (cross-validated in tests).

void hexl_tpu_pack52(const uint64_t* in, uint32_t* out, uint64_t n) {
  constexpr uint64_t kMask = (1ULL << 52) - 1;
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < static_cast<int64_t>(n / 8); g++) {
    const uint64_t* c = in + g * 8;
    uint32_t* o = out + g * 13;
    // static per-word shift table (each packed word spans <= 2 values);
    // generated from the 52-bit stream layout, identical to ops/wirepack.py
    o[0] = static_cast<uint32_t>(c[0]);
    o[1] = static_cast<uint32_t>((c[0] & kMask) >> 32 | c[1] << 20);
    o[2] = static_cast<uint32_t>(c[1] >> 12);
    o[3] = static_cast<uint32_t>((c[1] & kMask) >> 44 | c[2] << 8);
    o[4] = static_cast<uint32_t>((c[2] & kMask) >> 24 | c[3] << 28);
    o[5] = static_cast<uint32_t>(c[3] >> 4);
    o[6] = static_cast<uint32_t>((c[3] & kMask) >> 36 | c[4] << 16);
    o[7] = static_cast<uint32_t>(c[4] >> 16);
    o[8] = static_cast<uint32_t>((c[4] & kMask) >> 48 | c[5] << 4);
    o[9] = static_cast<uint32_t>((c[5] & kMask) >> 28 | c[6] << 24);
    o[10] = static_cast<uint32_t>(c[6] >> 8);
    o[11] = static_cast<uint32_t>((c[6] & kMask) >> 40 | c[7] << 12);
    o[12] = static_cast<uint32_t>((c[7] & kMask) >> 20);
  }
}

void hexl_tpu_unpack52(const uint32_t* in, uint64_t* out, uint64_t n) {
  constexpr uint64_t kMask = (1ULL << 52) - 1;
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < static_cast<int64_t>(n / 8); g++) {
    const uint32_t* p = in + g * 13;
    uint64_t* c = out + g * 8;
    auto two = [&](int w) {  // words w, w+1 as one u64 (little endian)
      return static_cast<uint64_t>(p[w]) |
             (static_cast<uint64_t>(p[w + 1]) << 32);
    };
    c[0] = two(0) & kMask;
    c[1] = (two(1) >> 20 | static_cast<uint64_t>(p[3]) << 44) & kMask;
    c[2] = (two(3) >> 8) & kMask;
    c[3] = (two(4) >> 28 | static_cast<uint64_t>(p[6]) << 36) & kMask;
    c[4] = (two(6) >> 16 | static_cast<uint64_t>(p[8]) << 48) & kMask;
    c[5] = (two(8) >> 4) & kMask;
    c[6] = (two(9) >> 24 | static_cast<uint64_t>(p[11]) << 40) & kMask;
    c[7] = (two(11) >> 12) & kMask;
  }
}

}  // extern "C"
