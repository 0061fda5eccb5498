// Public API implementation: validation + enqueue.
//
// Mirrors the reference's L4/L5 layers (`host/src/hexl-fpga.cpp:18-91` relay
// + the FPGA_ASSERT validation wrappers in
// `host/src/{keyswitch,ntt,intt,dyadic_multiply}.cpp`).

#include "../include/hexl-fpga.h"

#include <cstdio>
#include <cstdlib>
#include <memory>

#include "runtime.hpp"
#include "stack_trace.hpp"

namespace {

void Check(bool cond, const char* msg) {
  // FPGA_ASSERT analog (`host/inc/fpga_assert.h:18-45`): always on here —
  // argument errors abort with a demangled backtrace rather than corrupt
  // memory (reference StackTrace_Impl, `host/src/stack_trace.cpp:19-80`).
  if (!cond) {
    std::fprintf(stderr, "hexl-tpu assertion failed: %s\n", msg);
    hexl_tpu::print_stack_trace();
    std::abort();
  }
}

bool IsSupportedN(uint64_t n) {
  return n == 1024 || n == 2048 || n == 4096 || n == 8192 || n == 16384 ||
         n == 32768;
}

std::string FenceKeyU64(std::initializer_list<uint64_t> vals) {
  std::string s;
  for (uint64_t v : vals)
    s.append(reinterpret_cast<const char*>(&v), sizeof(v));
  return s;
}

}  // namespace

namespace intel {
namespace hexl {

using hexl_tpu::DevicePool;
using hexl_tpu::OpType;
using hexl_tpu::WorkItem;

void acquire_FPGA_resources() { DevicePool::Acquire(); }
void release_FPGA_resources() { DevicePool::Release(); }

// ---------------------------------------------------------------- Dyadic --

void set_worksize_DyadicMultiply(uint64_t ws) {
  Check(ws > 0, "requires worksize > 0");
  DevicePool::Instance().SetWorksize(OpType::kDyadicMultiply, ws);
}

void DyadicMultiply(uint64_t* results, const uint64_t* operand1,
                    const uint64_t* operand2, uint64_t n,
                    const uint64_t* moduli, uint64_t n_moduli) {
  // validation mirrors `host/src/dyadic_multiply.cpp:15-27`
  Check(results != nullptr, "requires results != nullptr");
  Check(operand1 != nullptr, "requires operand1 != nullptr");
  Check(operand2 != nullptr, "requires operand2 != nullptr");
  Check(n_moduli > 0, "requires n_moduli > 0");
  Check(n > 0, "requires n > 0");
  Check(moduli != nullptr, "requires moduli != nullptr");

  auto item = std::make_unique<WorkItem>();
  item->type = OpType::kDyadicMultiply;
  item->moduli_copy.assign(moduli, moduli + n_moduli);
  item->dyadic = {results, operand1, operand2, n, item->moduli_copy.data(),
                  n_moduli};
  item->fence_key = FenceKeyU64({n, n_moduli});
  item->fence_key.append(
      reinterpret_cast<const char*>(item->moduli_copy.data()),
      n_moduli * sizeof(uint64_t));
  DevicePool::Instance().Enqueue(std::move(item));
}

bool DyadicMultiplyCompleted() {
  return DevicePool::Instance().Completed(OpType::kDyadicMultiply);
}

// -------------------------------------------------------------- KeySwitch --

void set_worksize_KeySwitch(uint64_t ws) {
  Check(ws > 0, "requires worksize > 0");
  DevicePool::Instance().SetWorksize(OpType::kKeySwitch, ws);
}

void KeySwitch(uint64_t* result, const uint64_t* t_target_iter_ptr, uint64_t n,
               uint64_t decomp_modulus_size, uint64_t key_modulus_size,
               uint64_t rns_modulus_size, uint64_t key_component_count,
               const uint64_t* moduli, const uint64_t** k_switch_keys,
               const uint64_t* modswitch_factors,
               const uint64_t* twiddle_factors) {
  // validation mirrors `host/src/keyswitch.cpp:15-44`
  Check(result != nullptr, "requires result != nullptr");
  Check(t_target_iter_ptr != nullptr, "requires t_target_iter_ptr != nullptr");
  Check(n == 16384 || n == 8192 || n == 4096 || n == 2048 || n == 1024,
        "requires n = 16384 / 8192 / 4096 / 2048 / 1024");
  Check(decomp_modulus_size > 0, "requires decomp_modulus_size > 0");
  Check(key_modulus_size <= 7, "requires key_modulus_size <= 7");
  // The compute path indexes tables/moduli up to key_modulus_size-1 (the
  // special modulus) for every decomp engine: key_modulus_size must strictly
  // exceed decomp_modulus_size or the engine loop would read out of bounds.
  Check(key_modulus_size > decomp_modulus_size,
        "requires key_modulus_size > decomp_modulus_size");
  // rns_modulus_size is fence-only in the reference (stored and compared at
  // `host/src/fpga_int.cpp:443`; the device kernel launches receive
  // n/decomp_modulus_size/modulus_meta only, `host/src/fpga.cpp:1296-1301`):
  // accept any positive value, compute independently of it.
  Check(rns_modulus_size > 0, "requires rns_modulus_size > 0");
  Check(key_component_count == 2, "requires key_component_count = 2");
  Check(moduli != nullptr, "requires moduli != nullptr");
  // range-check every modulus the kernel touches, special prime included
  for (uint64_t i = 0; i < key_modulus_size; ++i)
    Check(moduli[i] >= (uint64_t(1) << 16) && moduli[i] <= (uint64_t(1) << 52),
          "requires each modulus in [2^16, 2^52]");
  Check(k_switch_keys != nullptr, "requires k_switch_keys != nullptr");
  Check(modswitch_factors != nullptr, "requires modswitch_factors != nullptr");

  auto item = std::make_unique<WorkItem>();
  item->type = OpType::kKeySwitch;
  item->moduli_copy.assign(moduli, moduli + key_modulus_size);
  item->msf_copy.assign(modswitch_factors,
                        modswitch_factors + key_modulus_size);
  item->key_ptrs_copy.assign(k_switch_keys,
                             k_switch_keys + decomp_modulus_size);
  item->ks = {result,
              t_target_iter_ptr,
              n,
              decomp_modulus_size,
              key_modulus_size,
              rns_modulus_size,
              key_component_count,
              item->moduli_copy.data(),
              item->key_ptrs_copy.data(),
              item->msf_copy.data(),
              twiddle_factors};
  // fence on any config / keys / twiddle change (`fpga_int.cpp:429-448`;
  // keys identified by pointer like the reference's keys_map_)
  item->fence_key = FenceKeyU64({n, decomp_modulus_size, key_modulus_size,
                                 rns_modulus_size, key_component_count,
                                 reinterpret_cast<uint64_t>(twiddle_factors)});
  item->fence_key.append(
      reinterpret_cast<const char*>(item->moduli_copy.data()),
      key_modulus_size * sizeof(uint64_t));
  item->fence_key.append(reinterpret_cast<const char*>(item->msf_copy.data()),
                         key_modulus_size * sizeof(uint64_t));
  item->fence_key.append(
      reinterpret_cast<const char*>(item->key_ptrs_copy.data()),
      decomp_modulus_size * sizeof(const uint64_t*));
  DevicePool::Instance().Enqueue(std::move(item));
}

bool KeySwitchCompleted() {
  return DevicePool::Instance().Completed(OpType::kKeySwitch);
}

// ------------------------------------------------- deprecated NTT / INTT --

void _set_worksize_NTT(uint64_t ws) {
  Check(ws > 0, "requires worksize > 0");
  DevicePool::Instance().SetWorksize(OpType::kNtt, ws);
}

void _NTT(uint64_t* operand, const uint64_t* root_of_unity_powers,
          const uint64_t* precon_root_of_unity_powers, uint64_t coeff_modulus,
          uint64_t n) {
  // `host/src/ntt.cpp:15-29`: the shipped bitstream asserts n == 16384; like
  // the emulation build we accept any supported power of two.
  Check(operand != nullptr, "requires operand != nullptr");
  Check(root_of_unity_powers != nullptr,
        "requires root_of_unity_powers != nullptr");
  Check(precon_root_of_unity_powers != nullptr,
        "requires precon_root_of_unity_powers != nullptr");
  Check(IsSupportedN(n), "requires supported power-of-two n");

  auto item = std::make_unique<WorkItem>();
  item->type = OpType::kNtt;
  item->ntt = {operand, root_of_unity_powers, precon_root_of_unity_powers,
               coeff_modulus, 0, 0, n};
  item->fence_key =
      FenceKeyU64({n, coeff_modulus});  // fence on modulus change
  DevicePool::Instance().Enqueue(std::move(item));
}

bool _NTTCompleted() { return DevicePool::Instance().Completed(OpType::kNtt); }

void _set_worksize_INTT(uint64_t ws) {
  Check(ws > 0, "requires worksize > 0");
  DevicePool::Instance().SetWorksize(OpType::kIntt, ws);
}

void _INTT(uint64_t* operand, const uint64_t* inv_root_of_unity_powers,
           const uint64_t* precon_inv_root_of_unity_powers,
           uint64_t coeff_modulus, uint64_t inv_n, uint64_t inv_n_w,
           uint64_t n) {
  Check(operand != nullptr, "requires operand != nullptr");
  Check(inv_root_of_unity_powers != nullptr,
        "requires inv_root_of_unity_powers != nullptr");
  Check(precon_inv_root_of_unity_powers != nullptr,
        "requires precon_inv_root_of_unity_powers != nullptr");
  Check(IsSupportedN(n), "requires supported power-of-two n");

  auto item = std::make_unique<WorkItem>();
  item->type = OpType::kIntt;
  item->ntt = {operand, inv_root_of_unity_powers,
               precon_inv_root_of_unity_powers, coeff_modulus, inv_n, inv_n_w,
               n};
  item->fence_key = FenceKeyU64({n, coeff_modulus});
  DevicePool::Instance().Enqueue(std::move(item));
}

bool _INTTCompleted() {
  return DevicePool::Instance().Completed(OpType::kIntt);
}

}  // namespace hexl
}  // namespace intel
