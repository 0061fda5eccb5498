// Native-runtime self-test: exercises the full public API end to end through
// the async scheduler (the reference's test strategy is likewise end-to-end
// through the API — SURVEY.md §4).  Bit-level cross-validation against the
// Python golden models happens in tests/test_cpp_shim.py; this binary checks
// the invariants provable without an external oracle:
//   * NTT -> INTT roundtrip is the identity (all stimulus patterns);
//   * DyadicMultiply matches a direct __int128 recompute;
//   * KeySwitch(0, 0-key) leaves the result unchanged, and the worksize /
//     fence / batching protocol completes under mixed interleaving.

#include <cinttypes>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

#include "../include/hexl-fpga.h"
#include "../include/hexl_tpu_backend.h"
#include "../src/compute.hpp"
#include "../src/number_theory.hpp"

using hexl_tpu::u128;
using hexl_tpu::u64;

#define CHECK(cond)                                                  \
  do {                                                               \
    if (!(cond)) {                                                   \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      std::exit(1);                                                  \
    }                                                                \
  } while (0)

#pragma GCC diagnostic ignored "-Wdeprecated-declarations"

static void TestNttRoundtrip() {
  const u64 n = 1024;
  for (int bits : {20, 30, 45, 52}) {
    const u64 q = hexl_tpu::generate_primes(1, bits, n)[0];
    auto t = hexl_tpu::make_ntt_tables(n, q);
    std::mt19937_64 rng(42);
    // stimulus patterns mirror the reference matrix
    // (`tests/test_fwd_ntt.cpp:15-62`)
    std::vector<std::vector<u64>> stimuli;
    std::vector<u64> v(n);
    for (auto& x : v) x = rng() % q;
    stimuli.push_back(v);                                // RANDOM
    for (u64 i = 0; i < n; ++i) v[i] = i % q;
    stimuli.push_back(v);                                // RAMP
    stimuli.push_back(std::vector<u64>(n, 0));           // ZEROS
    stimuli.push_back(std::vector<u64>(n, 1));           // ONES
    stimuli.push_back(std::vector<u64>(n, q - 1));       // MAX
    v.assign(n, 0);
    v[0] = 1;
    stimuli.push_back(v);                                // IMPULSE

    for (auto& s : stimuli) {
      std::vector<u64> x = s;
      intel::hexl::_set_worksize_NTT(1);
      intel::hexl::_NTT(x.data(), t.fwd.data(), t.fwd_precon.data(), q, n);
      intel::hexl::_NTTCompleted();
      intel::hexl::_set_worksize_INTT(1);
      intel::hexl::_INTT(x.data(), t.inv.data(), t.inv_precon.data(), q,
                         t.inv_n, t.inv_n_w, n);
      intel::hexl::_INTTCompleted();
      CHECK(std::memcmp(x.data(), s.data(), n * sizeof(u64)) == 0);
    }
    // impulse at 0 transforms to the all-ones vector (negacyclic DFT of delta)
    std::vector<u64> imp(n, 0);
    imp[0] = 1;
    intel::hexl::_set_worksize_NTT(1);
    intel::hexl::_NTT(imp.data(), t.fwd.data(), t.fwd_precon.data(), q, n);
    intel::hexl::_NTTCompleted();
    for (u64 i = 0; i < n; ++i) CHECK(imp[i] == 1);
  }
  std::puts("ntt roundtrip: OK");
}

static void TestDyadicMultiply() {
  const u64 n = 512, n_moduli = 3;
  std::vector<u64> moduli = {65537, (u64(1) << 30) + 3, (u64(1) << 50) + 5};
  std::mt19937_64 rng(7);
  std::vector<u64> op1(2 * n_moduli * n), op2(2 * n_moduli * n),
      out(3 * n_moduli * n, 0);
  for (u64 p = 0; p < 2; ++p)
    for (u64 m = 0; m < n_moduli; ++m)
      for (u64 j = 0; j < n; ++j) {
        op1[(p * n_moduli + m) * n + j] = rng() % moduli[m];
        op2[(p * n_moduli + m) * n + j] = rng() % moduli[m];
      }
  // batched-async path: worksize 4, four interleaved enqueues of the same op
  intel::hexl::set_worksize_DyadicMultiply(4);
  std::vector<std::vector<u64>> outs(4, std::vector<u64>(3 * n_moduli * n));
  for (int w = 0; w < 4; ++w)
    intel::hexl::DyadicMultiply(outs[w].data(), op1.data(), op2.data(), n,
                                moduli.data(), n_moduli);
  intel::hexl::DyadicMultiplyCompleted();
  for (u64 m = 0; m < n_moduli; ++m) {
    const u64 q = moduli[m];
    for (u64 j = 0; j < n; ++j) {
      const u64 x0 = op1[m * n + j], x1 = op1[(n_moduli + m) * n + j];
      const u64 y0 = op2[m * n + j], y1 = op2[(n_moduli + m) * n + j];
      const u64 e0 = static_cast<u64>(static_cast<u128>(x0) * y0 % q);
      const u64 e1 = static_cast<u64>(
          (static_cast<u128>(x0) * y1 + static_cast<u128>(x1) * y0) % q);
      const u64 e2 = static_cast<u64>(static_cast<u128>(x1) * y1 % q);
      for (int w = 0; w < 4; ++w) {
        CHECK(outs[w][m * n + j] == e0);
        CHECK(outs[w][(n_moduli + m) * n + j] == e1);
        CHECK(outs[w][(2 * n_moduli + m) * n + j] == e2);
      }
    }
  }
  std::puts("dyadic multiply: OK");
}

static void TestKeySwitchZeroKey() {
  // with all-zero switch keys, every accumulator is zero, the tail produces
  // (0 + q - NTT(reduce(qk/2-centered INTT(0)+fix))) * msf — still a valid
  // run; with result=0 the op must complete and stay < q everywhere.
  const u64 n = 1024, L = 2, K = 3;
  auto primes = hexl_tpu::generate_primes(K, 40, n);
  std::vector<u64> moduli(primes.begin(), primes.end());
  std::mt19937_64 rng(3);
  std::vector<u64> t_target(L * n);
  for (u64 i = 0; i < L; ++i)
    for (u64 j = 0; j < n; ++j) t_target[i * n + j] = rng() % moduli[i];
  std::vector<std::vector<u64>> keys(L, std::vector<u64>(2 * K * n, 0));
  std::vector<const u64*> key_ptrs;
  for (auto& k : keys) key_ptrs.push_back(k.data());
  std::vector<u64> msf(K, 1);
  std::vector<u64> result(2 * L * n, 0);
  intel::hexl::set_worksize_KeySwitch(1);
  intel::hexl::KeySwitch(result.data(), t_target.data(), n, L, K, L + 1, 2,
                         moduli.data(), key_ptrs.data(), msf.data(), nullptr);
  intel::hexl::KeySwitchCompleted();
  for (u64 k = 0; k < 2; ++k)
    for (u64 i = 0; i < L; ++i)
      for (u64 j = 0; j < n; ++j) CHECK(result[(k * L + i) * n + j] < moduli[i]);
  std::puts("keyswitch zero-key: OK");
}

#include <atomic>
#include <thread>

static void TestConcurrentCallers() {
  // several caller threads interleaving dyadic ops (the scheduler is
  // multi-producer; NUM_DEV workers drain one shared queue)
  const u64 n = 256;
  const u64 q = 65537;
  std::atomic<int> failures{0};
  auto worker = [&](int seed) {
    std::mt19937_64 rng(seed);
    for (int iter = 0; iter < 8; ++iter) {
      std::vector<u64> op1(2 * n), op2(2 * n), out(3 * n, 0);
      for (u64 i = 0; i < 2 * n; ++i) {
        op1[i] = rng() % q;
        op2[i] = rng() % q;
      }
      intel::hexl::DyadicMultiply(out.data(), op1.data(), op2.data(), n, &q,
                                  1);
      intel::hexl::DyadicMultiplyCompleted();
      for (u64 j = 0; j < n; ++j) {
        const u64 e0 = static_cast<u64>(static_cast<u128>(op1[j]) * op2[j] % q);
        if (out[j] != e0) {
          ++failures;
          return;
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < 4; ++t) threads.emplace_back(worker, 100 + t);
  for (auto& th : threads) th.join();
  CHECK(failures.load() == 0);
  std::puts("concurrent callers: OK");
}

// ---------------------------------------------------------------------------
// ABI v2 (split submit/finalize) — cpp/include/hexl_tpu_backend.h.  A mock
// pipelined backend checks the scheduler's overlap window: batch i+1 must be
// SUBMITTED before batch i is finalized (the reference's ping-pong staging,
// `host/src/fpga.cpp:1517-1545`), results must be correct, and a finalize
// that fails (returns 0, results untouched) must recover on the native path.
// ---------------------------------------------------------------------------

#include <condition_variable>
#include <map>
#include <mutex>
#include <string>

namespace {

struct MockV2 {
  std::mutex mu;
  std::condition_variable cv;
  bool all_enqueued = false;  // caller signals after its last enqueue
  std::vector<std::string> events;
  std::map<u64, std::vector<hexl_tpu_dyadic_op>> inflight;
  u64 next_handle = 1;
  bool fail_finalize = false;

  static u64 SubmitDyadic(void* ctx, hexl_tpu_dyadic_op* ops, u64 count) {
    auto* m = static_cast<MockV2*>(ctx);
    std::unique_lock<std::mutex> lock(m->mu);
    // hold the first submit until the caller finished enqueueing, so the
    // batch boundaries (and thus the event sequence) are deterministic
    m->cv.wait(lock, [&] { return m->all_enqueued; });
    const u64 h = m->next_handle++;
    m->events.push_back("S" + std::to_string(h));
    m->inflight[h].assign(ops, ops + count);
    return h;
  }

  static int Finalize(void* ctx, u64 h) {
    auto* m = static_cast<MockV2*>(ctx);
    std::vector<hexl_tpu_dyadic_op> ops;
    {
      std::lock_guard<std::mutex> lock(m->mu);
      m->events.push_back("F" + std::to_string(h));
      auto it = m->inflight.find(h);
      if (it == m->inflight.end()) return 0;
      ops.swap(it->second);
      m->inflight.erase(it);
      if (m->fail_finalize) return 0;  // results untouched -> native rerun
    }
    for (auto& op : ops)
      hexl_tpu::dyadic_multiply(op.results, op.operand1, op.operand2, op.n,
                                op.moduli, op.n_moduli);
    return 1;
  }
};

}  // namespace

static void TestBackendV2Pipelining() {
  // re-create the pool with a batch limit of 2 so worksize 6 forms 3 batches
  intel::hexl::release_FPGA_resources();
  setenv("BATCH_SIZE_DYADIC_MULTIPLY", "2", 1);
  intel::hexl::acquire_FPGA_resources();

  const u64 n = 256, q = 65537;
  std::mt19937_64 rng(17);
  const int W = 6;
  std::vector<std::vector<u64>> op1(W), op2(W), out(W);
  for (int w = 0; w < W; ++w) {
    op1[w].resize(2 * n);
    op2[w].resize(2 * n);
    out[w].assign(3 * n, 0);
    for (u64 i = 0; i < 2 * n; ++i) {
      op1[w][i] = rng() % q;
      op2[w][i] = rng() % q;
    }
  }
  auto check_outputs = [&] {
    for (int w = 0; w < W; ++w)
      for (u64 j = 0; j < n; ++j) {
        const u64 x0 = op1[w][j], x1 = op1[w][n + j];
        const u64 y0 = op2[w][j], y1 = op2[w][n + j];
        CHECK(out[w][j] == static_cast<u64>(static_cast<u128>(x0) * y0 % q));
        CHECK(out[w][n + j] ==
              static_cast<u64>(
                  (static_cast<u128>(x0) * y1 + static_cast<u128>(x1) * y0) %
                  q));
        CHECK(out[w][2 * n + j] ==
              static_cast<u64>(static_cast<u128>(x1) * y1 % q));
      }
  };

  MockV2 mock;
  hexl_tpu_backend_v2 be{};
  be.submit_dyadic_batch = &MockV2::SubmitDyadic;
  be.finalize_batch = &MockV2::Finalize;
  be.ctx = &mock;
  hexl_tpu_register_backend_v2(&be);

  intel::hexl::set_worksize_DyadicMultiply(W);
  for (int w = 0; w < W; ++w)
    intel::hexl::DyadicMultiply(out[w].data(), op1[w].data(), op2[w].data(), n,
                                &q, 1);
  {
    std::lock_guard<std::mutex> lock(mock.mu);
    mock.all_enqueued = true;
    mock.cv.notify_all();
  }
  intel::hexl::DyadicMultiplyCompleted();
  check_outputs();
  // the overlap window: once the first submit returns, >= 4 ops are still
  // queued, so batch 2 must be SUBMITTED before batch 1 finalizes.  (Batch
  // boundaries depend on when the worker first popped, so only the prefix
  // is fully deterministic.)
  {
    std::lock_guard<std::mutex> lock(mock.mu);
    CHECK(mock.events.size() >= 4);
    CHECK(mock.events.size() % 2 == 0);  // every submit finalized
    CHECK(mock.events[0] == "S1");
    CHECK(mock.events[1] == "S2");
    CHECK(mock.events[2] == "F1");
    CHECK(mock.inflight.empty());
  }

  // failed finalize: backend returns 0 with results untouched; the
  // scheduler must recover on the native CPU path, bit-exact
  {
    std::lock_guard<std::mutex> lock(mock.mu);
    mock.fail_finalize = true;
  }
  for (int w = 0; w < W; ++w) std::fill(out[w].begin(), out[w].end(), 0);
  intel::hexl::set_worksize_DyadicMultiply(W);
  for (int w = 0; w < W; ++w)
    intel::hexl::DyadicMultiply(out[w].data(), op1[w].data(), op2[w].data(), n,
                                &q, 1);
  intel::hexl::DyadicMultiplyCompleted();
  check_outputs();

  hexl_tpu_register_backend_v2(nullptr);
  intel::hexl::release_FPGA_resources();
  unsetenv("BATCH_SIZE_DYADIC_MULTIPLY");
  intel::hexl::acquire_FPGA_resources();  // restore for the final release
  std::puts("backend v2 pipelining: OK");
}

// ---------------------------------------------------------------------------
// v2 read-after-write hazard: a submit SNAPSHOTS its inputs (like the JAX
// backend) while the previous batch is still in flight.  When op i+1 reads a
// buffer op i writes, the scheduler must finalize op i BEFORE submitting
// op i+1 — otherwise the snapshot is stale and the result silently wrong.
// ---------------------------------------------------------------------------

namespace {

struct MockV2Snap {
  std::mutex mu;
  std::condition_variable cv;
  bool all_enqueued = false;
  struct Shot {
    hexl_tpu_dyadic_op op;
    std::vector<u64> in1, in2;  // input contents at SUBMIT time
  };
  std::map<u64, std::vector<Shot>> inflight;
  u64 next_handle = 1;

  static u64 SubmitDyadic(void* ctx, hexl_tpu_dyadic_op* ops, u64 count) {
    auto* m = static_cast<MockV2Snap*>(ctx);
    std::unique_lock<std::mutex> lock(m->mu);
    if (m->next_handle == 1)  // hold only the FIRST submit: once it returns,
      m->cv.wait(lock, [&] { return m->all_enqueued; });  // op 2 is queued
    const u64 h = m->next_handle++;
    auto& shots = m->inflight[h];
    for (u64 i = 0; i < count; ++i) {
      Shot s;
      s.op = ops[i];
      const u64 w = 2 * ops[i].n_moduli * ops[i].n;
      s.in1.assign(ops[i].operand1, ops[i].operand1 + w);
      s.in2.assign(ops[i].operand2, ops[i].operand2 + w);
      shots.push_back(std::move(s));
    }
    return h;
  }

  static int Finalize(void* ctx, u64 h) {
    auto* m = static_cast<MockV2Snap*>(ctx);
    std::vector<Shot> shots;
    {
      std::lock_guard<std::mutex> lock(m->mu);
      auto it = m->inflight.find(h);
      if (it == m->inflight.end()) return 0;
      shots.swap(it->second);
      m->inflight.erase(it);
    }
    for (auto& s : shots)
      hexl_tpu::dyadic_multiply(s.op.results, s.in1.data(), s.in2.data(),
                                s.op.n, s.op.moduli, s.op.n_moduli);
    return 1;
  }
};

}  // namespace

static void TestBackendV2AliasHazard() {
  intel::hexl::release_FPGA_resources();
  setenv("BATCH_SIZE_DYADIC_MULTIPLY", "1", 1);  // two one-op batches
  intel::hexl::acquire_FPGA_resources();

  const u64 n = 256, q = 65537;
  std::mt19937_64 rng(23);
  std::vector<u64> a(2 * n), b(2 * n), c(2 * n);
  for (u64 i = 0; i < 2 * n; ++i) {
    a[i] = rng() % q;
    b[i] = rng() % q;
    c[i] = rng() % q;
  }
  // op1 writes out1; op2 reads out1's first 2n words as its operand1
  std::vector<u64> out1(3 * n, 0), out2(3 * n, 0);

  MockV2Snap mock;
  hexl_tpu_backend_v2 be{};
  be.submit_dyadic_batch = &MockV2Snap::SubmitDyadic;
  be.finalize_batch = &MockV2Snap::Finalize;
  be.ctx = &mock;
  hexl_tpu_register_backend_v2(&be);

  intel::hexl::set_worksize_DyadicMultiply(2);
  intel::hexl::DyadicMultiply(out1.data(), a.data(), b.data(), n, &q, 1);
  intel::hexl::DyadicMultiply(out2.data(), out1.data(), c.data(), n, &q, 1);
  {
    std::lock_guard<std::mutex> lock(mock.mu);
    mock.all_enqueued = true;
    mock.cv.notify_all();
  }
  intel::hexl::DyadicMultiplyCompleted();

  // expected: sequential evaluation
  std::vector<u64> want1(3 * n), want2(3 * n);
  hexl_tpu::dyadic_multiply(want1.data(), a.data(), b.data(), n, &q, 1);
  hexl_tpu::dyadic_multiply(want2.data(), want1.data(), c.data(), n, &q, 1);
  CHECK(out1 == want1);
  CHECK(out2 == want2);  // stale snapshot would have read out1 == zeros

  hexl_tpu_register_backend_v2(nullptr);
  intel::hexl::release_FPGA_resources();
  unsetenv("BATCH_SIZE_DYADIC_MULTIPLY");
  intel::hexl::acquire_FPGA_resources();
  std::puts("backend v2 alias hazard drain: OK");
}

int main() {
  intel::hexl::acquire_FPGA_resources();
  TestNttRoundtrip();
  TestDyadicMultiply();
  TestKeySwitchZeroKey();
  TestConcurrentCallers();
  TestBackendV2Pipelining();
  TestBackendV2AliasHazard();
  intel::hexl::release_FPGA_resources();
  std::puts("selftest: ALL OK");
  return 0;
}
