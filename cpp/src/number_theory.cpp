#include "number_theory.hpp"

#include <cassert>
#include <stdexcept>

namespace hexl_tpu {

u64 pow_mod(u64 base, u64 exp, u64 q) {
  u64 result = 1 % q;
  base %= q;
  while (exp) {
    if (exp & 1) result = mul_mod_u128(result, base, q);
    base = mul_mod_u128(base, base, q);
    exp >>= 1;
  }
  return result;
}

u64 inverse_mod(u64 a, u64 q) {
  // extended Euclid over signed 128-bit intermediates
  __int128 t = 0, new_t = 1;
  __int128 r = q, new_r = a % q;
  if (new_r == 0) throw std::invalid_argument("0 has no inverse");
  while (new_r != 0) {
    __int128 quot = r / new_r;
    __int128 tmp = t - quot * new_t;
    t = new_t;
    new_t = tmp;
    tmp = r - quot * new_r;
    r = new_r;
    new_r = tmp;
  }
  if (r > 1) throw std::invalid_argument("not invertible");
  if (t < 0) t += q;
  return static_cast<u64>(t);
}

static const u64 kMillerRabinBases[] = {2,  3,  5,  7,  11, 13,
                                        17, 19, 23, 29, 31, 37};

bool is_prime(u64 n) {
  if (n < 2) return false;
  for (u64 a : kMillerRabinBases) {
    if (n == a) return true;
    if (n % a == 0) return false;
  }
  u64 d = n - 1;
  int r = 0;
  while ((d & 1) == 0) {
    d >>= 1;
    ++r;
  }
  for (u64 a : kMillerRabinBases) {
    u64 x = pow_mod(a, d, n);
    if (x == 1 || x == n - 1) continue;
    bool witness = true;
    for (int i = 0; i < r - 1; ++i) {
      x = mul_mod_u128(x, x, n);
      if (x == n - 1) {
        witness = false;
        break;
      }
    }
    if (witness) return false;
  }
  return true;
}

std::vector<u64> generate_primes(int num_primes, int bit_size, u64 ntt_size) {
  // primes in [2^bit_size, 2^(bit_size+1)) with q % (2*ntt_size) == 1
  // (mirrors hetest::utils::GeneratePrimes, `tests/test_utils/ntt.cpp:220-246`)
  std::vector<u64> ret;
  u64 value = (u64(1) << bit_size) + 1;
  const u64 end = u64(1) << (bit_size + 1);
  while (value < end) {
    if (is_prime(value)) {
      ret.push_back(value);
      if (static_cast<int>(ret.size()) == num_primes) return ret;
    }
    value += 2 * ntt_size;
  }
  throw std::runtime_error("failed to find enough primes");
}

u64 reverse_bits(u64 x, int bit_width) {
  u64 rev = 0;
  for (int i = bit_width; i > 0; --i) {
    rev |= (x & 1) << (i - 1);
    x >>= 1;
  }
  return rev;
}

int log2_exact(u64 n) {
  assert(n && (n & (n - 1)) == 0);
  int b = 0;
  while ((u64(1) << b) < n) ++b;
  return b;
}

static bool is_primitive_root(u64 root, u64 degree, u64 q) {
  if (root == 0) return false;
  return pow_mod(root, degree / 2, q) == q - 1;
}

u64 minimal_primitive_root(u64 degree, u64 q) {
  // Find any primitive degree-th root, then walk the odd powers
  // root * (root^2)^i — which enumerate all primitive roots — taking the
  // minimum.  Deterministic candidate scan replaces the reference's
  // randomized start; the minimum over the full orbit is identical.
  u64 quotient = (q - 1) / degree;
  u64 root = 0;
  for (u64 cand = 2; cand < q; ++cand) {
    u64 r = pow_mod(cand, quotient, q);
    if (is_primitive_root(r, degree, q)) {
      root = r;
      break;
    }
  }
  if (!root) throw std::runtime_error("no primitive root");
  u64 gen_sq = mul_mod_u128(root, root, q);
  u64 current = root, min_root = root;
  for (u64 i = 0; i < degree; ++i) {
    if (current < min_root) min_root = current;
    current = mul_mod_u128(current, gen_sq, q);
  }
  return min_root;
}

NttTables make_ntt_tables(u64 n, u64 q) {
  NttTables t;
  t.n = n;
  t.q = q;
  const int bits = log2_exact(n);
  const u64 w = minimal_primitive_root(2 * n, q);
  t.fwd.assign(n, 0);
  u64 power = 1;
  for (u64 i = 0; i < n; ++i) {
    t.fwd[reverse_bits(i, bits)] = power;
    power = mul_mod_u128(power, w, q);
  }
  std::vector<u64> inv_pre(n);
  for (u64 i = 0; i < n; ++i) inv_pre[i] = inverse_mod(t.fwd[i], q);
  // golden scan order: [inv_pre[0], inv_pre[n/2:n], inv_pre[n/4:n/2], ... ]
  t.inv.reserve(n);
  t.inv.push_back(inv_pre[0]);
  for (u64 m = n >> 1; m > 0; m >>= 1)
    for (u64 i = m; i < 2 * m && i < n; ++i) t.inv.push_back(inv_pre[i]);
  t.inv.resize(n);
  t.fwd_precon.resize(n);
  t.inv_precon.resize(n);
  for (u64 i = 0; i < n; ++i) {
    t.fwd_precon[i] = barrett_factor64(t.fwd[i], q);
    t.inv_precon[i] = barrett_factor64(t.inv[i], q);
  }
  t.inv_n = inverse_mod(n % q, q);
  t.inv_n_w = mul_mod_u128(t.inv_n, t.inv[n - 1], q);
  t.inv_n_precon = barrett_factor64(t.inv_n, q);
  t.inv_n_w_precon = barrett_factor64(t.inv_n_w, q);
  return t;
}

NttTables tables_from_keyswitch_buffer(const u64* block, u64 n, u64 q) {
  NttTables t;
  t.n = n;
  t.q = q;
  const u64* inv_ks = block;
  const u64* fwd = block + 2 * n;
  const u64* fwd_precon = block + 3 * n;
  t.fwd.assign(fwd, fwd + n);
  t.fwd_precon.assign(fwd_precon, fwd_precon + n);
  // keyswitch layout drops the inverse table's leading 1 (slot n-1 zeroed)
  t.inv.assign(n, 0);
  t.inv[0] = 1;
  for (u64 i = 1; i < n; ++i) t.inv[i] = inv_ks[i - 1];
  t.inv_precon.resize(n);
  for (u64 i = 0; i < n; ++i) t.inv_precon[i] = barrett_factor64(t.inv[i], q);
  t.inv_n = inverse_mod(n % q, q);
  t.inv_n_w = mul_mod_u128(t.inv_n, t.inv[n - 1], q);
  t.inv_n_precon = barrett_factor64(t.inv_n, q);
  t.inv_n_w_precon = barrett_factor64(t.inv_n_w, q);
  return t;
}

}  // namespace hexl_tpu
