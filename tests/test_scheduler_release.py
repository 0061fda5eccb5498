"""Release-while-pending semantics: workers must drain the queue before
exiting so no completed() waiter is left spinning."""

import threading
import time

import numpy as np

from hexl_fpga_tpu import config as config_mod
from hexl_fpga_tpu.ops import golden
from hexl_fpga_tpu.runtime import scheduler


class _SlowExecutor:
    def run_batch(self, batch):
        time.sleep(0.02)
        for item in batch:
            a = item.args
            out = golden.dyadic_multiply(
                a["operand1"], a["operand2"], a["n"], a["moduli"], a["n_moduli"]
            )
            np.copyto(a["results"], out.reshape(a["results"].shape))


def test_release_drains_pending_work(monkeypatch):
    config_mod.reset_config()
    pool = scheduler.DevicePool(executor_factory=lambda i: _SlowExecutor())
    n, q = 64, 65537
    rng = np.random.default_rng(0)
    jobs = []
    pool.set_worksize(scheduler.DYADIC_MULTIPLY, 8)
    for _ in range(8):
        op1 = rng.integers(0, q, size=2 * n, dtype=np.uint64)
        op2 = rng.integers(0, q, size=2 * n, dtype=np.uint64)
        out = np.zeros(3 * n, dtype=np.uint64)
        moduli = np.array([q], dtype=np.uint64)
        jobs.append((op1, op2, out))
        pool.enqueue(
            scheduler.DYADIC_MULTIPLY, (n, 1, moduli.tobytes()),
            {"results": out, "operand1": op1, "operand2": op2, "n": n,
             "moduli": moduli, "n_moduli": 1},
        )
    # a waiter blocks on completion while release() fires concurrently
    done = {}

    def waiter():
        done["ok"] = pool.completed(scheduler.DYADIC_MULTIPLY)

    t = threading.Thread(target=waiter)
    t.start()
    pool.release()
    t.join(timeout=10)
    assert not t.is_alive(), "completed() left spinning after release()"
    assert done.get("ok") is True
    for op1, op2, out in jobs:
        np.testing.assert_array_equal(
            out, golden.dyadic_multiply(op1, op2, n, [q], 1)
        )
    config_mod.reset_config()
