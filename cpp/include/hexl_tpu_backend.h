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

// ---------------------------------------------------------------------------
// v2: split submit/finalize — host-staging <-> device-compute overlap.
//
// The reference keeps its device saturated by reading batch i-1's results
// while batch i computes (ping-pong KeySwitch objects,
// `host/src/fpga.cpp:1517-1545`; CREDIT=2 dyadic pipelining, `fpga.h:618`).
// v1's blocking executors cannot express that: the scheduler worker stalls
// inside the backend for the whole batch.  v2 splits each batch into
//   submit_*_batch  — stage inputs and dispatch asynchronously; returns a
//                     nonzero completion handle, or 0 to decline the batch
//                     (the scheduler then falls back to v1 / native CPU);
//   finalize_batch  — block until the handle's results are written to the
//                     ops' result pointers; nonzero on success.  Returning 0
//                     means the batch FAILED; the backend must then have left
//                     every result buffer unmodified (KeySwitch accumulates
//                     into `result`, so a partial write would corrupt the
//                     native re-run) and the scheduler re-runs the batch on
//                     the native CPU path.
// The scheduler guarantees the `ops` array and every pointer inside it stay
// valid until finalize_batch returns for that handle, and that at most one
// batch per worker is in flight (submit i+1 happens before finalize i — the
// overlap window).  When batch i+1's input buffers (including the KeySwitch
// accumulate-into `result` and the in-place NTT `operand`) alias buffers
// batch i has yet to write, the scheduler finalizes batch i BEFORE the
// submit, so a submit may always snapshot its inputs immediately.
// On TPU the natural implementation is JAX async dispatch:
// submit = host staging + jitted call (returns device futures), finalize =
// fetch + demux.
// ---------------------------------------------------------------------------

typedef struct hexl_tpu_backend_v2 {
  uint64_t (*submit_dyadic_batch)(void* ctx, hexl_tpu_dyadic_op* ops,
                                  uint64_t count);
  uint64_t (*submit_keyswitch_batch)(void* ctx, hexl_tpu_keyswitch_op* ops,
                                     uint64_t count);
  // inverse = 0 for forward NTT, 1 for INTT.
  uint64_t (*submit_ntt_batch)(void* ctx, hexl_tpu_ntt_op* ops, uint64_t count,
                               int inverse);
  int (*finalize_batch)(void* ctx, uint64_t handle);
  void* ctx;
} hexl_tpu_backend_v2;

// Install (or clear, with NULL) the pipelined accelerator backend.  When both
// v1 and v2 are registered, v2 is tried first; a declined submit falls back
// to v1, then to the native CPU path.
void hexl_tpu_register_backend_v2(const hexl_tpu_backend_v2* backend);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // HEXL_FPGA_TPU_BACKEND_H_
