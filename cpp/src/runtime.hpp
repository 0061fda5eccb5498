// Asynchronous batching scheduler — the C++ runtime behind the public API.
//
// Behavioral contract reproduced from the reference host scheduler
// (`host/inc/fpga.h:96-732`, `host/src/fpga.cpp`: Object / Buffer / Device /
// DevicePool) and its dispatch layer (`host/src/fpga_int.cpp`):
//   * set_worksize_X(ws) ... ws x X(...) ... XCompleted() protocol;
//     ws == 1 executes synchronously;
//   * a bounded work queue (FPGA_BUFSIZE) feeds NUM_DEV worker threads;
//   * ops batch up to BATCH_SIZE_X per submission but never across a *fence*
//     (parameter change vs the previous queued op of the same type —
//     `fpga_int.cpp:263-273,429-448`);
//   * XCompleted() blocks until every outstanding op of that type finished
//     and resets the worksize to 1 (`fpga_int.cpp:209-232,484-507`).
// The architecture is new: instead of SYCL queues + credit/ping-pong staging
// buffers, batches go to a pluggable backend (hexl_tpu_backend.h) with the
// native CPU path as fallback; accelerator pipelining is the backend's job
// (XLA async dispatch on TPU).

#ifndef HEXL_FPGA_TPU_RUNTIME_HPP_
#define HEXL_FPGA_TPU_RUNTIME_HPP_

#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <functional>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "../include/hexl_tpu_backend.h"

namespace hexl_tpu {

enum class OpType : int { kDyadicMultiply = 0, kNtt, kIntt, kKeySwitch };
constexpr int kNumOpTypes = 4;

struct WorkItem {
  OpType type;
  bool fence = false;
  bool ready = false;
  std::string fence_key;  // serialized static config; change => fence
  // op payloads (only the fields for `type` are meaningful)
  hexl_tpu_dyadic_op dyadic{};
  hexl_tpu_keyswitch_op ks{};
  hexl_tpu_ntt_op ntt{};
  // deep copies keeping borrowed pointers alive while queued
  std::vector<uint64_t> moduli_copy;
  std::vector<uint64_t> msf_copy;
  std::vector<const uint64_t*> key_ptrs_copy;
};

struct RuntimeConfig {
  int run_choice = 2;        // 0 native CPU, 1/2 backend-if-registered
  int batch_dyadic = 1;      // BATCH_SIZE_DYADIC_MULTIPLY
  int batch_ntt = 1;         // BATCH_SIZE_NTT
  int batch_intt = 1;        // BATCH_SIZE_INTT
  int batch_keyswitch = 1;   // BATCH_SIZE_KEYSWITCH (capped 1024)
  int bufsize = 1024;        // FPGA_BUFSIZE
  int num_dev = 1;           // NUM_DEV
  int debug = 0;             // FPGA_DEBUG
  static RuntimeConfig FromEnv();
};

class DevicePool {
 public:
  static DevicePool& Instance();      // created on first use
  static void Acquire();              // reference acquire_FPGA_resources
  static void Release();              // drain + join

  void SetWorksize(OpType t, uint64_t ws);
  void Enqueue(std::unique_ptr<WorkItem> item);
  bool Completed(OpType t);           // block until done; reset ws to 1

  void RegisterBackend(const hexl_tpu_backend_v1* backend);
  void RegisterBackendV2(const hexl_tpu_backend_v2* backend);

 private:
  // one in-flight v2 batch per worker (the reference's ping-pong window,
  // `host/src/fpga.cpp:1517-1545`): submitted, not yet finalized
  struct PendingBatch {
    uint64_t handle = 0;
    hexl_tpu_backend_v2 be{};  // v-table snapshot used for the submit
    std::vector<WorkItem*> items;
    // op arrays passed to submit_*; must outlive finalize_batch
    std::vector<hexl_tpu_dyadic_op> dy;
    std::vector<hexl_tpu_keyswitch_op> ks;
    std::vector<hexl_tpu_ntt_op> ntt;
    std::chrono::steady_clock::time_point submitted_at;
  };

  DevicePool();
  ~DevicePool();
  void WorkerLoop(int index);
  void RunBatch(std::vector<WorkItem*>& batch);
  void RunNative(const std::vector<WorkItem*>& batch);
  std::unique_ptr<PendingBatch> TrySubmitV2(std::vector<WorkItem*>& batch);
  void FinalizePending(PendingBatch& pending);
  void MarkReady(const std::vector<WorkItem*>& batch);
  int BatchLimit(OpType t) const;

  RuntimeConfig cfg_;
  mutable std::mutex mu_;
  std::condition_variable not_empty_, not_full_, item_done_;
  std::deque<WorkItem*> queue_;
  std::vector<std::unique_ptr<WorkItem>> outstanding_[kNumOpTypes];
  std::string last_fence_key_[kNumOpTypes];
  bool has_last_key_[kNumOpTypes] = {false, false, false, false};
  uint64_t worksize_[kNumOpTypes] = {1, 1, 1, 1};
  bool closed_ = false;
  std::vector<std::thread> workers_;

  std::mutex backend_mu_;
  hexl_tpu_backend_v1 backend_{};
  bool backend_set_ = false;
  hexl_tpu_backend_v2 backend_v2_{};
  bool backend_v2_set_ = false;
};

}  // namespace hexl_tpu

#endif  // HEXL_FPGA_TPU_RUNTIME_HPP_
