// hexl-tpu: public C++ API, drop-in compatible with the reference header
// (`/root/reference/host/inc/hexl-fpga.h:15-161` — same 14 exported
// functions, same signatures) so SEAL-bridge-style integrations re-link
// unchanged.  Behind this ABI sits a TPU-native runtime: an asynchronous
// batching scheduler (src/runtime.cpp) that routes batches either to the
// native CPU compute path (src/compute.cpp) or to a registered accelerator
// backend (include/hexl_tpu_backend.h) — in production, the JAX/Pallas TPU
// executors registered through the Python bridge.

#ifndef HEXL_FPGA_TPU_API_H_
#define HEXL_FPGA_TPU_API_H_

#include <cstdint>

namespace intel {
namespace hexl {

/// Reserve compute resources (spawns the scheduler worker threads).
/// Reference: acquire_FPGA_resources, hexl-fpga.h:15.
void acquire_FPGA_resources();

/// Release compute resources (drains and joins the workers).
void release_FPGA_resources();

// ---------------------------------------------------------------- Dyadic --

/// Declare how many DyadicMultiply ops will be enqueued before the next
/// DyadicMultiplyCompleted().  ws == 1 means synchronous execution.
void set_worksize_DyadicMultiply(uint64_t ws);

/// Ciphertext x ciphertext multiplication: 2x2 -> 3 polynomial products per
/// RNS modulus.  Layouts per the reference (hexl-fpga.h:41-43):
///   operand: [2][n_moduli][n], results: [3][n_moduli][n].
void DyadicMultiply(uint64_t* results, const uint64_t* operand1,
                    const uint64_t* operand2, uint64_t n,
                    const uint64_t* moduli, uint64_t n_moduli);

/// Block until every outstanding DyadicMultiply completed; resets worksize.
bool DyadicMultiplyCompleted();

// -------------------------------------------------------------- KeySwitch --

void set_worksize_KeySwitch(uint64_t ws);

/// BGV/CKKS-style keyswitch core.  `result` ([key_component_count][decomp][n])
/// is ACCUMULATED into (reference fill_out_data semantics, fpga.cpp:441-475).
/// t_target_iter_ptr: [decomp][n] in NTT form; k_switch_keys[i]:
/// [comp][key_modulus][n]; twiddle_factors: optional caller buffer in the
/// keyswitch host layout (key_modulus x [inv|inv_precon|fwd|fwd_precon] x n).
void KeySwitch(uint64_t* result, const uint64_t* t_target_iter_ptr, uint64_t n,
               uint64_t decomp_modulus_size, uint64_t key_modulus_size,
               uint64_t rns_modulus_size, uint64_t key_component_count,
               const uint64_t* moduli, const uint64_t** k_switch_keys,
               const uint64_t* modswitch_factors,
               const uint64_t* twiddle_factors = nullptr);

bool KeySwitchCompleted();

// ------------------------------------------------- deprecated NTT / INTT --
// Deprecated since reference v1.1 (hexl-fpga.h:88-161) but kept for parity.

[[deprecated]] void _set_worksize_NTT(uint64_t ws);

/// In-place forward negacyclic NTT with caller-supplied twiddle tables
/// (golden layout: root_of_unity_powers[bit_reverse(i)] = w^i).
[[deprecated]] void _NTT(uint64_t* operand,
                         const uint64_t* root_of_unity_powers,
                         const uint64_t* precon_root_of_unity_powers,
                         uint64_t coeff_modulus, uint64_t n);

[[deprecated]] bool _NTTCompleted();

[[deprecated]] void _set_worksize_INTT(uint64_t ws);

/// In-place inverse negacyclic NTT; inv_n = n^{-1} mod q, inv_n_w = n^{-1} *
/// W_last mod q (the fused last-stage constants).
[[deprecated]] void _INTT(uint64_t* operand,
                          const uint64_t* inv_root_of_unity_powers,
                          const uint64_t* precon_inv_root_of_unity_powers,
                          uint64_t coeff_modulus, uint64_t inv_n,
                          uint64_t inv_n_w, uint64_t n);

[[deprecated]] bool _INTTCompleted();

}  // namespace hexl
}  // namespace intel

#endif  // HEXL_FPGA_TPU_API_H_
