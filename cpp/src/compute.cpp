#include "compute.hpp"

#include <cstddef>
#include <vector>

using std::size_t;

namespace hexl_tpu {

void fwd_ntt(u64* x, u64 n, u64 q, const u64* fwd, const u64* fwd_precon) {
  const u64 twice_q = q << 1;
  u64 t = n >> 1;
  for (u64 m = 1; m < n; m <<= 1, t >>= 1) {
    for (u64 i = 0; i < m; ++i) {
      const u64 W = fwd[m + i];
      const u64 Wp = fwd_precon[m + i];
      u64* X = x + 2 * i * t;
      u64* Y = X + t;
      for (u64 j = 0; j < t; ++j) {
        const u64 tx = X[j] >= twice_q ? X[j] - twice_q : X[j];
        const u64 T = mul_mod_lazy(Y[j], W, Wp, q);
        X[j] = tx + T;
        Y[j] = tx + twice_q - T;
      }
    }
  }
  for (u64 j = 0; j < n; ++j) {
    u64 v = x[j];
    if (v >= twice_q) v -= twice_q;
    if (v >= q) v -= q;
    x[j] = v;
  }
}

void inv_ntt(u64* x, u64 n, u64 q, const u64* inv, const u64* inv_precon,
             u64 inv_n, u64 inv_n_w) {
  const u64 twice_q = q << 1;
  u64 t = 1;
  u64 root_index = 1;
  for (u64 m = n >> 1; m > 1; m >>= 1, t <<= 1) {
    for (u64 i = 0; i < m; ++i) {
      const u64 W = inv[root_index + i];
      const u64 Wp = inv_precon[root_index + i];
      u64* X = x + 2 * i * t;
      u64* Y = X + t;
      for (u64 j = 0; j < t; ++j) {
        const u64 tx = X[j] + Y[j];
        const u64 ty = X[j] + twice_q - Y[j];
        X[j] = tx >= twice_q ? tx - twice_q : tx;
        Y[j] = mul_mod_lazy(ty, W, Wp, q);
      }
    }
    root_index += m;
  }
  // fused final stage: X half scaled by n^{-1}, Y half by n^{-1} * W_last
  // (golden model `tests/test_utils/ntt.cpp:629-646`)
  const u64 inv_n_precon = barrett_factor64(inv_n, q);
  const u64 inv_n_w_precon = barrett_factor64(inv_n_w, q);
  const u64 h = n >> 1;
  for (u64 j = 0; j < h; ++j) {
    const u64 tx0 = x[j] + x[j + h];
    const u64 tx = tx0 >= twice_q ? tx0 - twice_q : tx0;
    const u64 ty = x[j] + twice_q - x[j + h];
    x[j] = mul_mod_lazy(tx, inv_n, inv_n_precon, q);
    x[j + h] = mul_mod_lazy(ty, inv_n_w, inv_n_w_precon, q);
  }
  for (u64 j = 0; j < n; ++j)
    if (x[j] >= q) x[j] -= q;
}

void dyadic_multiply(u64* results, const u64* op1, const u64* op2, u64 n,
                     const u64* moduli, u64 n_moduli) {
  // operands [2][n_moduli][n]; out [3][n_moduli][n]:
  // out0 = x0*y0, out1 = x0*y1 + x1*y0, out2 = x1*y1 per modulus
#pragma omp parallel for schedule(static)
  for (u64 m = 0; m < n_moduli; ++m) {
    const u64 q = moduli[m];
    const u64* x0 = op1 + m * n;
    const u64* x1 = op1 + (n_moduli + m) * n;
    const u64* y0 = op2 + m * n;
    const u64* y1 = op2 + (n_moduli + m) * n;
    u64* o0 = results + m * n;
    u64* o1 = results + (n_moduli + m) * n;
    u64* o2 = results + (2 * n_moduli + m) * n;
    for (u64 j = 0; j < n; ++j) {
      o0[j] = mul_mod_u128(x0[j], y0[j], q);
      const u128 cross =
          static_cast<u128>(x0[j]) * y1[j] + static_cast<u128>(x1[j]) * y0[j];
      o1[j] = static_cast<u64>(cross % q);
      o2[j] = mul_mod_u128(x1[j], y1[j], q);
    }
  }
}

void keyswitch(u64* result, const u64* t_target, u64 n, u64 decomp_size,
               u64 key_modulus_size, u64 key_component_count,
               const u64* moduli, const u64* const* k_switch_keys,
               const u64* modswitch_factors, const NttTables* tables) {
  const u64 L = decomp_size;
  const u64 K = key_modulus_size;
  const u64 comp = key_component_count;
  const u64 qk = moduli[K - 1];
  const u64 qk_half = qk >> 1;

  // INTT1: each decomp poly out of NTT form under its own modulus
  // (`device/keyswitch/intt1.hpp`; canonical output)
  std::vector<std::vector<u64>> coeff(L);
  for (u64 i = 0; i < L; ++i) {
    coeff[i].assign(t_target + i * n, t_target + (i + 1) * n);
    const NttTables& tb = tables[i];
    inv_ntt(coeff[i].data(), n, moduli[i], tb.inv.data(),
            tb.inv_precon.data(), tb.inv_n, tb.inv_n_w);
  }

  // Engines 0..L-1 plus the special engine K-1
  // (`device/keyswitch/dyadmult.hpp:144-146`): acc[j][k] =
  // sum_i NTT_qj(reduce_qj(coeff_i)) * keys_i[k][j] (mod qj)
  std::vector<u64> engines;
  for (u64 j = 0; j < L; ++j) engines.push_back(j);
  engines.push_back(K - 1);

  // acc indexed [engine][comp][n]; engine L is the special one
  std::vector<std::vector<std::vector<u64>>> acc(
      engines.size(),
      std::vector<std::vector<u64>>(comp, std::vector<u64>(n, 0)));

#pragma omp parallel for schedule(dynamic)
  for (size_t e = 0; e < engines.size(); ++e) {
    std::vector<u64> red(n);
    const u64 j = engines[e];
    const u64 q = moduli[j];
    const u64 q_barr = barrett_factor64(1, q);  // floor(2^64 / q)
    const NttTables& tb = tables[j];
    for (u64 i = 0; i < L; ++i) {
      // intt1_redu: Barrett-reduce coeff (< q_i) into q_j
      // (`device/keyswitch/intt1_redu.hpp:30-46`)
      for (u64 c = 0; c < n; ++c) {
        const u64 v = coeff[i][c];
        const u64 Q = mulhi64(v, q_barr);
        u64 r = v - Q * q;
        if (r >= q) r -= q;
        red[c] = r;
      }
      fwd_ntt(red.data(), n, q, tb.fwd.data(), tb.fwd_precon.data());
      const u64* keys_i = k_switch_keys[i];  // [comp][K][n]
      for (u64 k = 0; k < comp; ++k) {
        const u64* key = keys_i + (k * K + j) * n;
        u64* a = acc[e][k].data();
        for (u64 c = 0; c < n; ++c) {
          const u128 s = static_cast<u128>(a[c]) +
                         static_cast<u128>(red[c]) * key[c] % q;
          a[c] = static_cast<u64>(s >= q ? s - q : s);
        }
      }
    }
  }

  // Special-modulus tail (`intt2_core.hpp`, `intt2_redu.hpp`, `ms.hpp`):
  // INTT under qk, +qk/2 centering, reduce into each q_i, NTT, subtract from
  // the q_i accumulator, scale by the reduced modswitch factor, accumulate
  // into the caller's result (fill_out_data, `host/src/fpga.cpp:441-475`).
  for (u64 k = 0; k < comp; ++k) {
    std::vector<u64>& d = acc[engines.size() - 1][k];
    const NttTables& tbk = tables[K - 1];
    inv_ntt(d.data(), n, qk, tbk.inv.data(), tbk.inv_precon.data(), tbk.inv_n,
            tbk.inv_n_w);
    for (u64 c = 0; c < n; ++c) {
      u64 e = d[c] + qk_half;
      if (e >= qk) e -= qk;
      d[c] = e;
    }
#pragma omp parallel for schedule(dynamic)
    for (u64 i = 0; i < L; ++i) {
      std::vector<u64> f(n);
      const u64 q = moduli[i];
      const u64 fix = q - (qk_half % q);
      const NttTables& tb = tables[i];
      for (u64 c = 0; c < n; ++c)
        f[c] = static_cast<u64>((static_cast<u128>(d[c]) + fix) % q);
      fwd_ntt(f.data(), n, q, tb.fwd.data(), tb.fwd_precon.data());
      const u64 msf = modswitch_factors[i] % q;
      u64* r = result + (k * L + i) * n;
      const u64* a = acc[i][k].data();
      for (u64 c = 0; c < n; ++c) {
        const u64 diff = a[c] + q - f[c];
        const u64 out = static_cast<u64>(static_cast<u128>(diff) * msf % q);
        u64 acc_out = r[c] + out;
        if (acc_out >= q) acc_out -= q;
        r[c] = acc_out;
      }
    }
  }
}

}  // namespace hexl_tpu
