"""Scheduler-internals tests: NUM_DEV worker pools, batching limits, queue
bounds — behavioral parity with the reference Buffer/DevicePool
(`host/src/fpga.cpp:92-190,1609-1685`)."""

import threading

import numpy as np
import pytest

from hexl_fpga_tpu import config as config_mod
from hexl_fpga_tpu.ops import golden
from hexl_fpga_tpu.runtime import scheduler


class _CountingExecutor:
    def __init__(self):
        self.batches = []
        self.lock = threading.Lock()

    def run_batch(self, batch):
        with self.lock:
            self.batches.append(len(batch))
        for item in batch:
            a = item.args
            out = golden.dyadic_multiply(
                a["operand1"], a["operand2"], a["n"], a["moduli"], a["n_moduli"]
            )
            np.copyto(a["results"], out.reshape(a["results"].shape))


def _mk_pool(monkeypatch, executor, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, str(v))
    config_mod.reset_config()
    pool = scheduler.DevicePool(executor_factory=lambda i: executor)
    return pool


def _enqueue_dyadic(pool, count, n=64, q=65537):
    rng = np.random.default_rng(0)
    jobs = []
    pool.set_worksize(scheduler.DYADIC_MULTIPLY, count)
    for _ in range(count):
        op1 = rng.integers(0, q, size=2 * n, dtype=np.uint64)
        op2 = rng.integers(0, q, size=2 * n, dtype=np.uint64)
        out = np.zeros(3 * n, dtype=np.uint64)
        jobs.append((op1, op2, out))
        moduli = np.array([q], dtype=np.uint64)
        pool.enqueue(
            scheduler.DYADIC_MULTIPLY,
            (n, 1, moduli.tobytes()),
            {"results": out, "operand1": op1, "operand2": op2, "n": n,
             "moduli": moduli, "n_moduli": 1},
        )
    assert pool.completed(scheduler.DYADIC_MULTIPLY)
    for op1, op2, out in jobs:
        np.testing.assert_array_equal(
            out, golden.dyadic_multiply(op1, op2, n, [q], 1)
        )


def test_multi_worker_pool(monkeypatch):
    ex = _CountingExecutor()
    pool = _mk_pool(monkeypatch, ex, NUM_DEV=3, BATCH_SIZE_DYADIC_MULTIPLY=2)
    try:
        assert len(pool.devices) == 3
        _enqueue_dyadic(pool, 12)
        assert sum(ex.batches) == 12
        assert max(ex.batches) <= 2  # batch limit respected
    finally:
        pool.release()
    config_mod.reset_config()


def test_small_bufsize_backpressure(monkeypatch):
    ex = _CountingExecutor()
    pool = _mk_pool(monkeypatch, ex, FPGA_BUFSIZE=2)
    try:
        _enqueue_dyadic(pool, 10)  # must not deadlock on the bounded queue
        assert sum(ex.batches) == 10
    finally:
        pool.release()
    config_mod.reset_config()


class _SplitExecutor(_CountingExecutor):
    """Submit/finalize split executor: counts finalizations per submission.

    Each submit() issues a unique token (CPython object ids recycle across
    waves, so id-based fingerprints would report false duplicates)."""

    def __init__(self):
        super().__init__()
        self.finalized = []
        self._next_token = 0

    def submit(self, batch):
        with self.lock:
            token = self._next_token
            self._next_token += 1

        def finalize():
            self.run_batch(batch)
            with self.lock:
                self.finalized.append((token, len(batch)))

        return finalize


def test_each_batch_finalized_exactly_once(monkeypatch):
    """The overlapped (ping-pong) demux path must finalize every batch once
    — a stale `pending` reference must never be demuxed twice."""
    ex = _SplitExecutor()
    pool = _mk_pool(monkeypatch, ex, BATCH_SIZE_DYADIC_MULTIPLY=4)
    try:
        for _ in range(3):  # multiple waves incl. queue-went-idle boundaries
            _enqueue_dyadic(pool, 10)
        tokens = [t for t, _ in ex.finalized]
        assert len(tokens) == len(set(tokens))  # no batch demuxed twice
        assert sum(sz for _, sz in ex.finalized) == 30  # none dropped
    finally:
        pool.release()
    config_mod.reset_config()


def test_concurrent_producers(monkeypatch):
    ex = _CountingExecutor()
    pool = _mk_pool(monkeypatch, ex, NUM_DEV=2, BATCH_SIZE_DYADIC_MULTIPLY=4)
    n, q = 64, 65537
    errs = []

    def producer(seed):
        try:
            rng = np.random.default_rng(seed)
            for _ in range(5):
                op1 = rng.integers(0, q, size=2 * n, dtype=np.uint64)
                op2 = rng.integers(0, q, size=2 * n, dtype=np.uint64)
                out = np.zeros(3 * n, dtype=np.uint64)
                moduli = np.array([q], dtype=np.uint64)
                pool.enqueue(
                    scheduler.DYADIC_MULTIPLY,
                    (n, 1, moduli.tobytes()),
                    {"results": out, "operand1": op1, "operand2": op2,
                     "n": n, "moduli": moduli, "n_moduli": 1},
                )
                np.testing.assert_array_equal(
                    out, golden.dyadic_multiply(op1, op2, n, [q], 1)
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    try:
        # worksize 1 (default) => each enqueue is synchronous per caller
        threads = [threading.Thread(target=producer, args=(s,)) for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
    finally:
        pool.release()
    config_mod.reset_config()
