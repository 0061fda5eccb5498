// Native CPU compute path — the RUN_CHOICE=0 tier.
//
// Bit-exact with the Python golden models (hexl_fpga_tpu/ops/golden.py) and
// with the reference's software oracle (`tests/test_utils/ntt.cpp` Harvey
// lazy butterflies) and decoded keyswitch dataflow (SURVEY.md §3.3).  This
// is both the accelerator fallback and the correctness oracle for the C++
// test binary.

#ifndef HEXL_FPGA_TPU_COMPUTE_HPP_
#define HEXL_FPGA_TPU_COMPUTE_HPP_

#include <cstdint>

#include "number_theory.hpp"

namespace hexl_tpu {

inline u64 mulhi64(u64 a, u64 b) {
  return static_cast<u64>((static_cast<u128>(a) * b) >> 64);
}

// Harvey lazy multiply: (x * w) mod q with result in [0, 2q)
// (MultiplyUIntModLazy<64>, `tests/test_utils/ntt.hpp:86-101`).
inline u64 mul_mod_lazy(u64 x, u64 w, u64 w_precon, u64 q) {
  u64 Q = mulhi64(x, w_precon);
  return w * x - Q * q;  // wrapping u64: exact low 64 bits
}

// Forward negacyclic NTT in place, canonical [0, q) output.
void fwd_ntt(u64* x, u64 n, u64 q, const u64* fwd, const u64* fwd_precon);

// Inverse negacyclic NTT in place (incl. n^{-1} normalization), canonical
// output.  inv table in golden scan order (leading 1).
void inv_ntt(u64* x, u64 n, u64 q, const u64* inv, const u64* inv_precon,
             u64 inv_n, u64 inv_n_w);

// Dyadic ciphertext multiply: operands [2][n_moduli][n] ->
// results [3][n_moduli][n] (`device/dyadic_multiply.cpp:195-228`).
void dyadic_multiply(u64* results, const u64* op1, const u64* op2, u64 n,
                     const u64* moduli, u64 n_moduli);

// One KeySwitch op; accumulates into `result` ([comp][decomp][n]).
// Precomputed per-modulus tables are passed in (key_modulus_size entries).
void keyswitch(u64* result, const u64* t_target, u64 n, u64 decomp_size,
               u64 key_modulus_size, u64 key_component_count,
               const u64* moduli, const u64* const* k_switch_keys,
               const u64* modswitch_factors, const NttTables* tables);

}  // namespace hexl_tpu

#endif  // HEXL_FPGA_TPU_COMPUTE_HPP_
