// Host-side number theory for the native C++ path.
//
// Re-implements the reference's host number-theory layer
// (`host/inc/number_theory_util.h:44-225`, `host/src/number_theory_util.cpp`,
// `host/src/twiddle-factors.cpp:16-63`) with unsigned __int128 arithmetic.
// Table layouts match the Python `hexl_fpga_tpu.ops.twiddles` module bit for
// bit (both are validated against each other in tests/test_cpp_shim.py).

#ifndef HEXL_FPGA_TPU_NUMBER_THEORY_HPP_
#define HEXL_FPGA_TPU_NUMBER_THEORY_HPP_

#include <cstdint>
#include <vector>

namespace hexl_tpu {

using u64 = uint64_t;
using u128 = unsigned __int128;

inline u64 mul_mod_u128(u64 a, u64 b, u64 q) {
  return static_cast<u64>((static_cast<u128>(a) * b) % q);
}

u64 pow_mod(u64 base, u64 exp, u64 q);
u64 inverse_mod(u64 a, u64 q);
bool is_prime(u64 n);
std::vector<u64> generate_primes(int num_primes, int bit_size, u64 ntt_size);
u64 reverse_bits(u64 x, int bit_width);
int log2_exact(u64 n);

// floor(operand << 64 / q) — the 64-bit Barrett precondition factor
// (reference MultiplyFactor::BarrettFactor, `tests/test_utils/ntt.hpp:17-44`).
inline u64 barrett_factor64(u64 operand, u64 q) {
  return static_cast<u64>((static_cast<u128>(operand) << 64) / q);
}

// Minimal primitive degree-th root of unity mod q (canonical; reference
// MinimalPrimitiveRoot, `tests/test_utils/ntt.cpp:137-160`).
u64 minimal_primitive_root(u64 degree, u64 q);

// Golden-layout twiddle tables for one (n, q):
//   fwd[bit_reverse(i)] = w^i (w = minimal 2n-th root), fwd_precon = the
//   64-bit Barrett factors; inv in scan order with a leading 1; inv_n and
//   inv_n_w the fused last-stage constants.
struct NttTables {
  u64 n = 0;
  u64 q = 0;
  std::vector<u64> fwd, fwd_precon, inv, inv_precon;
  u64 inv_n = 0, inv_n_w = 0, inv_n_precon = 0, inv_n_w_precon = 0;
};

NttTables make_ntt_tables(u64 n, u64 q);

// Rebuild golden-layout tables from a caller keyswitch twiddle buffer
// (per-modulus blocks [inv, inv_precon, fwd, fwd_precon], each n entries,
// inverse tables lacking the leading 1 — `host/src/twiddle-factors.cpp`).
NttTables tables_from_keyswitch_buffer(const u64* block, u64 n, u64 q);

}  // namespace hexl_tpu

#endif  // HEXL_FPGA_TPU_NUMBER_THEORY_HPP_
