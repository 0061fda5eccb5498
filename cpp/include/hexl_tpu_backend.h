// Accelerator backend plug-in ABI (extern "C").
//
// The reference loads its device kernels by dlopen()ing a bitstream .so and
// dlsym()ing typed entry points (`host/src/dl_kernel_interfaces.cpp:9-33`).
// The TPU analog inverts the linkage: the host process that owns the TPU
// runtime (a Python process running JAX/Pallas, or any PJRT embedder)
// registers a v-table of batch executors here, and the C++ scheduler routes
// work batches through it.  If no backend is registered — or a callback
// declines a batch by returning 0 — the native CPU compute path
// (src/compute.cpp) runs instead, which mirrors the reference's
// RUN_CHOICE=0 Intel-HEXL CPU fallback (`host/src/fpga_int.cpp:195-207`).

#ifndef HEXL_FPGA_TPU_BACKEND_H_
#define HEXL_FPGA_TPU_BACKEND_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

// One DyadicMultiply op (pointers into caller memory; results is written).
typedef struct hexl_tpu_dyadic_op {
  uint64_t* results;
  const uint64_t* operand1;
  const uint64_t* operand2;
  uint64_t n;
  const uint64_t* moduli;
  uint64_t n_moduli;
} hexl_tpu_dyadic_op;

// One KeySwitch op.  `result` is accumulated into, not overwritten.
typedef struct hexl_tpu_keyswitch_op {
  uint64_t* result;
  const uint64_t* t_target;
  uint64_t n;
  uint64_t decomp_modulus_size;
  uint64_t key_modulus_size;
  uint64_t rns_modulus_size;
  uint64_t key_component_count;
  const uint64_t* moduli;
  const uint64_t* const* k_switch_keys;  // [decomp] x [comp*key_modulus*n]
  const uint64_t* modswitch_factors;
  const uint64_t* twiddle_factors;  // may be NULL
} hexl_tpu_keyswitch_op;

// One (deprecated-API) NTT/INTT op; operand is transformed in place.
typedef struct hexl_tpu_ntt_op {
  uint64_t* operand;
  const uint64_t* root_powers;  // fwd or inv table depending on `inverse`
  const uint64_t* precon_root_powers;
  uint64_t coeff_modulus;
  uint64_t inv_n;    // inverse only
  uint64_t inv_n_w;  // inverse only
  uint64_t n;
} hexl_tpu_ntt_op;

// Batch executors.  A fence in the scheduler guarantees every op in a batch
// shares its static configuration (n / moduli / keys ... — the recompile
// boundary).  Return nonzero if the batch was handled (results written);
// return 0 to fall back to the native CPU path for that batch.
typedef struct hexl_tpu_backend_v1 {
  int (*run_dyadic_batch)(void* ctx, hexl_tpu_dyadic_op* ops, uint64_t count);
  int (*run_keyswitch_batch)(void* ctx, hexl_tpu_keyswitch_op* ops,
                             uint64_t count);
  // inverse = 0 for forward NTT, 1 for INTT.
  int (*run_ntt_batch)(void* ctx, hexl_tpu_ntt_op* ops, uint64_t count,
                       int inverse);
  void* ctx;
} hexl_tpu_backend_v1;

// Install (or clear, with NULL) the accelerator backend.  The v-table is
// copied; `ctx` is passed back verbatim on every call.  Callbacks may be
// invoked from scheduler worker threads.
void hexl_tpu_register_backend(const hexl_tpu_backend_v1* backend);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // HEXL_FPGA_TPU_BACKEND_H_
