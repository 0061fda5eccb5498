#include "runtime.hpp"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <deque>
#include <map>
#include <memory>

#include "compute.hpp"

namespace hexl_tpu {

static int EnvInt(const char* name, int def, int lo, int hi) {
  const char* v = std::getenv(name);
  if (!v) return def;
  int x = std::atoi(v);
  if (x < lo) x = lo;
  if (x > hi) x = hi;
  return x;
}

RuntimeConfig RuntimeConfig::FromEnv() {
  // env table mirrors `host/src/fpga_int.cpp:40-141`
  RuntimeConfig c;
  c.run_choice = EnvInt("RUN_CHOICE", 2, 0, 2);
  c.batch_dyadic = EnvInt("BATCH_SIZE_DYADIC_MULTIPLY", 1, 1, 1 << 20);
  c.batch_ntt = EnvInt("BATCH_SIZE_NTT", 1, 1, 1 << 20);
  c.batch_intt = EnvInt("BATCH_SIZE_INTT", 1, 1, 1 << 20);
  c.batch_keyswitch = EnvInt("BATCH_SIZE_KEYSWITCH", 1, 1, 1024);
  c.bufsize = EnvInt("FPGA_BUFSIZE", 1024, 1, 1 << 24);
  c.num_dev = EnvInt("NUM_DEV", 1, 1, 256);
  c.debug = EnvInt("FPGA_DEBUG", 0, 0, 2);
  return c;
}

// ---------------------------------------------------------------------------
// per-config NTT table cache (the analog of KeySwitch_load_twiddles-once +
// the per-pointer key cache, `host/src/fpga.cpp:1091-1123,1158-1165`)
// ---------------------------------------------------------------------------

namespace {

std::mutex g_tables_mu;
// shared_ptr entries so eviction is safe while a worker still uses a table
// set; bounded so long-running processes cannot grow the cache without limit
std::map<std::string, std::shared_ptr<const std::vector<NttTables>>>
    g_tables_cache;
std::deque<std::string> g_tables_order;
constexpr size_t kTablesCacheSlots = 16;

// FNV-1a over a strided sample of the twiddle buffer: the cache key must
// depend on buffer CONTENTS, not just the pointer — a freed-and-reallocated
// buffer at the same address with different tables must miss.
uint64_t TwiddleFingerprint(const uint64_t* tw, uint64_t words) {
  uint64_t h = 1469598103934665603ull;
  auto mix = [&h](uint64_t v) {
    h ^= v;
    h *= 1099511628211ull;
  };
  const uint64_t stride = words > 256 ? words / 256 : 1;
  for (uint64_t i = 0; i < words; i += stride) mix(tw[i]);
  mix(tw[words - 1]);
  return h;
}

std::shared_ptr<const std::vector<NttTables>> GetKeySwitchTables(
    const hexl_tpu_keyswitch_op& op) {
  std::string key;
  key.reserve(64);
  key.append(reinterpret_cast<const char*>(&op.n), sizeof(op.n));
  key.append(reinterpret_cast<const char*>(&op.key_modulus_size),
             sizeof(op.key_modulus_size));
  key.append(reinterpret_cast<const char*>(op.moduli),
             op.key_modulus_size * sizeof(uint64_t));
  key.append(reinterpret_cast<const char*>(&op.twiddle_factors),
             sizeof(op.twiddle_factors));
  if (op.twiddle_factors) {
    const uint64_t fp =
        TwiddleFingerprint(op.twiddle_factors, 4 * op.n * op.key_modulus_size);
    key.append(reinterpret_cast<const char*>(&fp), sizeof(fp));
  }
  std::lock_guard<std::mutex> lock(g_tables_mu);
  auto it = g_tables_cache.find(key);
  if (it != g_tables_cache.end()) return it->second;
  auto tabs = std::make_shared<std::vector<NttTables>>();
  for (uint64_t j = 0; j < op.key_modulus_size; ++j) {
    if (op.twiddle_factors) {
      tabs->push_back(tables_from_keyswitch_buffer(
          op.twiddle_factors + j * 4 * op.n, op.n, op.moduli[j]));
    } else {
      tabs->push_back(make_ntt_tables(op.n, op.moduli[j]));
    }
  }
  g_tables_cache.emplace(key, tabs);
  g_tables_order.push_back(key);
  while (g_tables_order.size() > kTablesCacheSlots) {
    g_tables_cache.erase(g_tables_order.front());
    g_tables_order.pop_front();
  }
  return tabs;
}

}  // namespace

// ---------------------------------------------------------------------------
// DevicePool
// ---------------------------------------------------------------------------

static std::mutex g_pool_mu;
static DevicePool* g_pool = nullptr;

DevicePool& DevicePool::Instance() {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (!g_pool) g_pool = new DevicePool();
  return *g_pool;
}

void DevicePool::Acquire() { Instance(); }

void DevicePool::Release() {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (g_pool) {
    delete g_pool;
    g_pool = nullptr;
  }
}

DevicePool::DevicePool() : cfg_(RuntimeConfig::FromEnv()) {
  for (int i = 0; i < cfg_.num_dev; ++i)
    workers_.emplace_back(&DevicePool::WorkerLoop, this, i);
}

DevicePool::~DevicePool() {
  {
    std::lock_guard<std::mutex> lock(mu_);
    closed_ = true;
    not_empty_.notify_all();
    not_full_.notify_all();
  }
  for (auto& w : workers_) w.join();
}

void DevicePool::RegisterBackend(const hexl_tpu_backend_v1* backend) {
  std::lock_guard<std::mutex> lock(backend_mu_);
  if (backend) {
    backend_ = *backend;
    backend_set_ = true;
  } else {
    backend_ = hexl_tpu_backend_v1{};
    backend_set_ = false;
  }
}

void DevicePool::RegisterBackendV2(const hexl_tpu_backend_v2* backend) {
  std::lock_guard<std::mutex> lock(backend_mu_);
  if (backend) {
    backend_v2_ = *backend;
    backend_v2_set_ = true;
  } else {
    backend_v2_ = hexl_tpu_backend_v2{};
    backend_v2_set_ = false;
  }
}

void DevicePool::SetWorksize(OpType t, uint64_t ws) {
  std::lock_guard<std::mutex> lock(mu_);
  worksize_[static_cast<int>(t)] = ws ? ws : 1;
}

int DevicePool::BatchLimit(OpType t) const {
  switch (t) {
    case OpType::kDyadicMultiply: return cfg_.batch_dyadic;
    case OpType::kNtt: return cfg_.batch_ntt;
    case OpType::kIntt: return cfg_.batch_intt;
    case OpType::kKeySwitch: return cfg_.batch_keyswitch;
  }
  return 1;
}

void DevicePool::Enqueue(std::unique_ptr<WorkItem> item) {
  const int ti = static_cast<int>(item->type);
  bool sync = false;
  {
    std::unique_lock<std::mutex> lock(mu_);
    not_full_.wait(lock, [&] {
      return static_cast<int>(queue_.size()) < cfg_.bufsize || closed_;
    });
    if (closed_) {
      // Enqueue after release_FPGA_resources(): silently dropping the item
      // would let a later Completed() report success with the caller's
      // result buffer never written — abort like the other argument errors.
      std::fprintf(stderr,
                   "hexl-tpu assertion failed: enqueue after "
                   "release_FPGA_resources()\n");
      std::abort();
    }
    // fence when idle or when the static config changed vs the previous op
    // of this type (`fpga_int.cpp:263-273,429-448`)
    item->fence = queue_.empty() || !has_last_key_[ti] ||
                  last_fence_key_[ti] != item->fence_key;
    last_fence_key_[ti] = item->fence_key;
    has_last_key_[ti] = true;
    queue_.push_back(item.get());
    outstanding_[ti].push_back(std::move(item));
    sync = worksize_[ti] == 1;
    not_empty_.notify_one();
  }
  if (sync) Completed(static_cast<OpType>(ti));
}

bool DevicePool::Completed(OpType t) {
  const int ti = static_cast<int>(t);
  std::unique_lock<std::mutex> lock(mu_);
  item_done_.wait(lock, [&] {
    for (const auto& it : outstanding_[ti])
      if (!it->ready) return false;
    return true;
  });
  outstanding_[ti].clear();
  worksize_[ti] = 1;
  has_last_key_[ti] = false;
  return true;
}

void DevicePool::MarkReady(const std::vector<WorkItem*>& batch) {
  std::lock_guard<std::mutex> lock(mu_);
  for (WorkItem* it : batch) it->ready = true;
  item_done_.notify_all();
}

namespace {

// Read-after-write hazard between a submitted-not-finalized batch and the
// batch about to be submitted.  v2 submit SNAPSHOTS every input buffer —
// including KeySwitch `result` (accumulate-into) and the in-place NTT
// `operand` — before the pending batch's finalize writes its results, so
// any overlap between a pending WRITE range and a new SNAPSHOT-READ range
// must drain the pipeline first (the v1/native path is immune: it
// finalizes before running the next batch).
struct MemRange {
  uintptr_t lo, hi;
};

inline void AddRange(std::vector<MemRange>* v, const void* p, uint64_t words) {
  if (!p || !words) return;
  auto lo = reinterpret_cast<uintptr_t>(p);
  v->push_back({lo, lo + words * sizeof(uint64_t)});
}

void WriteRanges(const WorkItem& it, std::vector<MemRange>* v) {
  switch (it.type) {
    case OpType::kDyadicMultiply:
      AddRange(v, it.dyadic.results, 3 * it.dyadic.n_moduli * it.dyadic.n);
      break;
    case OpType::kKeySwitch:
      AddRange(v, it.ks.result,
               it.ks.key_component_count * it.ks.decomp_modulus_size * it.ks.n);
      break;
    case OpType::kNtt:
    case OpType::kIntt:
      AddRange(v, it.ntt.operand, it.ntt.n);
      break;
  }
}

void SnapshotReadRanges(const WorkItem& it, std::vector<MemRange>* v) {
  switch (it.type) {
    case OpType::kDyadicMultiply:
      AddRange(v, it.dyadic.operand1, 2 * it.dyadic.n_moduli * it.dyadic.n);
      AddRange(v, it.dyadic.operand2, 2 * it.dyadic.n_moduli * it.dyadic.n);
      break;
    case OpType::kKeySwitch:
      AddRange(v, it.ks.t_target, it.ks.decomp_modulus_size * it.ks.n);
      AddRange(v, it.ks.result,
               it.ks.key_component_count * it.ks.decomp_modulus_size * it.ks.n);
      break;
    case OpType::kNtt:
    case OpType::kIntt:
      AddRange(v, it.ntt.operand, it.ntt.n);
      break;
  }
}

bool HasRawHazard(const std::vector<WorkItem*>& pending,
                  const std::vector<WorkItem*>& next) {
  std::vector<MemRange> writes, reads;
  for (const auto* it : pending) WriteRanges(*it, &writes);
  for (const auto* it : next) SnapshotReadRanges(*it, &reads);
  for (const auto& w : writes)
    for (const auto& r : reads)
      if (w.lo < r.hi && r.lo < w.hi) return true;
  return false;
}

}  // namespace

void DevicePool::WorkerLoop(int index) {
  (void)index;
  // At most one submitted-not-finalized v2 batch is held here; while it
  // computes on the device, this thread stages and submits the next batch
  // (the reference reads batch i-1's output while batch i computes,
  // `host/src/fpga.cpp:1517-1545`).  The moment there is no follow-up work
  // to overlap with, the pending batch finalizes immediately — callers
  // blocked in Completed() never wait on a poll interval.
  std::unique_ptr<PendingBatch> pending;
  auto finalize_now = [&] {
    if (!pending) return;
    auto t0 = std::chrono::steady_clock::now();
    FinalizePending(*pending);
    MarkReady(pending->items);
    if (cfg_.debug) {
      auto now = std::chrono::steady_clock::now();
      auto fin_us =
          std::chrono::duration_cast<std::chrono::microseconds>(now - t0)
              .count();
      auto tot_us = std::chrono::duration_cast<std::chrono::microseconds>(
                        now - pending->submitted_at)
                        .count();
      std::fprintf(stderr,
                   "[hexl-tpu] op=%d batch=%zu v2 finalize: %lld us "
                   "(in-flight %lld us)\n",
                   static_cast<int>(pending->items[0]->type),
                   pending->items.size(), static_cast<long long>(fin_us),
                   static_cast<long long>(tot_us));
    }
    pending.reset();
  };
  for (;;) {
    std::vector<WorkItem*> batch;
    {
      std::unique_lock<std::mutex> lock(mu_);
      if (!pending) {
        not_empty_.wait(lock, [&] { return !queue_.empty() || closed_; });
      }
      if (queue_.empty()) {
        if (pending) {
          lock.unlock();
          finalize_now();
          continue;
        }
        if (closed_) return;
        continue;  // spurious wake
      }
      WorkItem* front = queue_.front();
      queue_.pop_front();
      batch.push_back(front);
      const int limit = BatchLimit(front->type);
      while (!queue_.empty() && static_cast<int>(batch.size()) < limit &&
             queue_.front()->type == front->type && !queue_.front()->fence) {
        batch.push_back(queue_.front());
        queue_.pop_front();
      }
      not_full_.notify_all();
    }
    // the next batch's submit snapshots its inputs NOW; if any of them
    // alias a buffer the pending batch has yet to write, drain first
    if (pending && HasRawHazard(pending->items, batch)) finalize_now();
    auto t0 = std::chrono::steady_clock::now();
    if (auto submitted = TrySubmitV2(batch)) {
      submitted->submitted_at = t0;
      if (cfg_.debug >= 2) {
        auto us = std::chrono::duration_cast<std::chrono::microseconds>(
                      std::chrono::steady_clock::now() - t0)
                      .count();
        std::fprintf(stderr, "[hexl-tpu] op=%d batch=%zu v2 submit: %lld us\n",
                     static_cast<int>(batch[0]->type), batch.size(),
                     static_cast<long long>(us));
      }
      // finalize the PREVIOUS batch only after this one is in flight
      finalize_now();
      pending = std::move(submitted);
      continue;
    }
    // synchronous v1/native path: drain the pipeline first to keep result
    // completion in submission order
    finalize_now();
    t0 = std::chrono::steady_clock::now();
    RunBatch(batch);
    MarkReady(batch);
    if (cfg_.debug) {
      auto us = std::chrono::duration_cast<std::chrono::microseconds>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
      std::fprintf(stderr, "[hexl-tpu] op=%d batch=%zu: %lld us\n",
                   static_cast<int>(batch[0]->type), batch.size(),
                   static_cast<long long>(us));
    }
  }
}

std::unique_ptr<DevicePool::PendingBatch> DevicePool::TrySubmitV2(
    std::vector<WorkItem*>& batch) {
  hexl_tpu_backend_v2 be{};
  bool have = false;
  if (cfg_.run_choice >= 1) {
    std::lock_guard<std::mutex> lock(backend_mu_);
    be = backend_v2_;
    have = backend_v2_set_;
  }
  if (!have || !be.finalize_batch) return nullptr;
  auto p = std::make_unique<PendingBatch>();
  p->be = be;
  p->items = batch;
  const OpType t = batch[0]->type;
  if (t == OpType::kDyadicMultiply && be.submit_dyadic_batch) {
    for (auto* it : batch) p->dy.push_back(it->dyadic);
    p->handle = be.submit_dyadic_batch(be.ctx, p->dy.data(), p->dy.size());
  } else if (t == OpType::kKeySwitch && be.submit_keyswitch_batch) {
    for (auto* it : batch) p->ks.push_back(it->ks);
    p->handle = be.submit_keyswitch_batch(be.ctx, p->ks.data(), p->ks.size());
  } else if ((t == OpType::kNtt || t == OpType::kIntt) &&
             be.submit_ntt_batch) {
    for (auto* it : batch) p->ntt.push_back(it->ntt);
    p->handle = be.submit_ntt_batch(be.ctx, p->ntt.data(), p->ntt.size(),
                                    t == OpType::kIntt ? 1 : 0);
  }
  if (!p->handle) return nullptr;
  return p;
}

void DevicePool::FinalizePending(PendingBatch& pending) {
  if (pending.be.finalize_batch(pending.be.ctx, pending.handle)) return;
  // failed finalize left the result buffers unmodified (ABI contract) —
  // recover on the native CPU path, like a declined v1 batch
  RunNative(pending.items);
}

void DevicePool::RunBatch(std::vector<WorkItem*>& batch) {
  const OpType t = batch[0]->type;
  // try the registered accelerator backend first (RUN_CHOICE>=1)
  hexl_tpu_backend_v1 be{};
  bool have_be = false;
  if (cfg_.run_choice >= 1) {
    std::lock_guard<std::mutex> lock(backend_mu_);
    be = backend_;
    have_be = backend_set_;
  }
  if (have_be) {
    int handled = 0;
    if (t == OpType::kDyadicMultiply && be.run_dyadic_batch) {
      std::vector<hexl_tpu_dyadic_op> ops;
      for (auto* it : batch) ops.push_back(it->dyadic);
      handled = be.run_dyadic_batch(be.ctx, ops.data(), ops.size());
    } else if (t == OpType::kKeySwitch && be.run_keyswitch_batch) {
      std::vector<hexl_tpu_keyswitch_op> ops;
      for (auto* it : batch) ops.push_back(it->ks);
      handled = be.run_keyswitch_batch(be.ctx, ops.data(), ops.size());
    } else if ((t == OpType::kNtt || t == OpType::kIntt) && be.run_ntt_batch) {
      std::vector<hexl_tpu_ntt_op> ops;
      for (auto* it : batch) ops.push_back(it->ntt);
      handled = be.run_ntt_batch(be.ctx, ops.data(), ops.size(),
                                 t == OpType::kIntt ? 1 : 0);
    }
    if (handled) return;
  }
  RunNative(batch);
}

void DevicePool::RunNative(const std::vector<WorkItem*>& batch) {
  const OpType t = batch[0]->type;
  for (WorkItem* it : batch) {
    switch (t) {
      case OpType::kDyadicMultiply: {
        const auto& op = it->dyadic;
        dyadic_multiply(op.results, op.operand1, op.operand2, op.n, op.moduli,
                        op.n_moduli);
        break;
      }
      case OpType::kKeySwitch: {
        const auto& op = it->ks;
        const auto tabs = GetKeySwitchTables(op);
        keyswitch(op.result, op.t_target, op.n, op.decomp_modulus_size,
                  op.key_modulus_size, op.key_component_count, op.moduli,
                  op.k_switch_keys, op.modswitch_factors, tabs->data());
        break;
      }
      case OpType::kNtt: {
        const auto& op = it->ntt;
        fwd_ntt(op.operand, op.n, op.coeff_modulus, op.root_powers,
                op.precon_root_powers);
        break;
      }
      case OpType::kIntt: {
        const auto& op = it->ntt;
        inv_ntt(op.operand, op.n, op.coeff_modulus, op.root_powers,
                op.precon_root_powers, op.inv_n, op.inv_n_w);
        break;
      }
    }
  }
}

}  // namespace hexl_tpu

// ---------------------------------------------------------------------------
// extern "C" backend registration
// ---------------------------------------------------------------------------

extern "C" void hexl_tpu_register_backend(const hexl_tpu_backend_v1* backend) {
  hexl_tpu::DevicePool::Instance().RegisterBackend(backend);
}

extern "C" void hexl_tpu_register_backend_v2(
    const hexl_tpu_backend_v2* backend) {
  hexl_tpu::DevicePool::Instance().RegisterBackendV2(backend);
}
