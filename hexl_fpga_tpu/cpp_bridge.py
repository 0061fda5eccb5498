"""ctypes bridge to the native C++ runtime (cpp/ -> libhexl_fpga_tpu.so).

Two directions:

* drive the C++ `hexl-fpga.h`-compatible API from Python (used by the parity
  tests — the C++ runtime must match the Python golden bit for bit);
* register the JAX/TPU executors as the C++ runtime's accelerator backend
  (`cpp/include/hexl_tpu_backend.h`), so a C++ caller of the reference API —
  e.g. a SEAL-bridge integration — transparently runs on TPU when the hosting
  process provides one.  This is the TPU analog of the reference dlopen'ing a
  bitstream .so (`host/src/dl_kernel_interfaces.cpp:9-33`), with the linkage
  inverted: the accelerator owner registers into the C++ runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent
_CPP_DIR = _REPO_ROOT / "cpp"
_BUILD_DIR = _CPP_DIR / "build"
_LIB_NAME = "libhexl_fpga_tpu.so"

u64_p = ctypes.POINTER(ctypes.c_uint64)
u64_pp = ctypes.POINTER(u64_p)


class DyadicOp(ctypes.Structure):
    _fields_ = [
        ("results", u64_p),
        ("operand1", u64_p),
        ("operand2", u64_p),
        ("n", ctypes.c_uint64),
        ("moduli", u64_p),
        ("n_moduli", ctypes.c_uint64),
    ]


class KeySwitchOp(ctypes.Structure):
    _fields_ = [
        ("result", u64_p),
        ("t_target", u64_p),
        ("n", ctypes.c_uint64),
        ("decomp_modulus_size", ctypes.c_uint64),
        ("key_modulus_size", ctypes.c_uint64),
        ("rns_modulus_size", ctypes.c_uint64),
        ("key_component_count", ctypes.c_uint64),
        ("moduli", u64_p),
        ("k_switch_keys", u64_pp),
        ("modswitch_factors", u64_p),
        ("twiddle_factors", u64_p),
    ]


class NttOp(ctypes.Structure):
    _fields_ = [
        ("operand", u64_p),
        ("root_powers", u64_p),
        ("precon_root_powers", u64_p),
        ("coeff_modulus", ctypes.c_uint64),
        ("inv_n", ctypes.c_uint64),
        ("inv_n_w", ctypes.c_uint64),
        ("n", ctypes.c_uint64),
    ]


DYADIC_CB = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(DyadicOp), ctypes.c_uint64
)
KEYSWITCH_CB = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(KeySwitchOp), ctypes.c_uint64
)
NTT_CB = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.c_void_p,
    ctypes.POINTER(NttOp),
    ctypes.c_uint64,
    ctypes.c_int,
)


class BackendV1(ctypes.Structure):
    _fields_ = [
        ("run_dyadic_batch", DYADIC_CB),
        ("run_keyswitch_batch", KEYSWITCH_CB),
        ("run_ntt_batch", NTT_CB),
        ("ctx", ctypes.c_void_p),
    ]


# v2 (split submit/finalize): submit returns a nonzero handle (0 = decline),
# finalize blocks until that handle's results are written (0 = failure with
# results untouched -> native rerun).  See cpp/include/hexl_tpu_backend.h.
DYADIC_SUBMIT_CB = ctypes.CFUNCTYPE(
    ctypes.c_uint64, ctypes.c_void_p, ctypes.POINTER(DyadicOp), ctypes.c_uint64
)
KEYSWITCH_SUBMIT_CB = ctypes.CFUNCTYPE(
    ctypes.c_uint64, ctypes.c_void_p, ctypes.POINTER(KeySwitchOp),
    ctypes.c_uint64,
)
NTT_SUBMIT_CB = ctypes.CFUNCTYPE(
    ctypes.c_uint64,
    ctypes.c_void_p,
    ctypes.POINTER(NttOp),
    ctypes.c_uint64,
    ctypes.c_int,
)
FINALIZE_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64)


class BackendV2(ctypes.Structure):
    _fields_ = [
        ("submit_dyadic_batch", DYADIC_SUBMIT_CB),
        ("submit_keyswitch_batch", KEYSWITCH_SUBMIT_CB),
        ("submit_ntt_batch", NTT_SUBMIT_CB),
        ("finalize_batch", FINALIZE_CB),
        ("ctx", ctypes.c_void_p),
    ]


# Newest symbol of the C ABI this module binds: a cached .so built before
# the symbol existed must be REBUILT, not loaded (binding would raise
# AttributeError deep inside NativeRuntime, and a same-path re-dlopen after
# rebuilding could still return the stale mapping).  Bump when the ABI grows.
_NEWEST_ABI_SYMBOL = b"hexl_tpu_register_backend_v2"


def build_library(force: bool = False) -> Path:
    """Build libhexl_fpga_tpu.so with cmake (cached in cpp/build)."""
    lib = _BUILD_DIR / _LIB_NAME
    if lib.exists() and not force:
        # the dynamic string table carries exported names verbatim; a miss
        # means the cache predates the current ABI
        if _NEWEST_ABI_SYMBOL in lib.read_bytes():
            return lib
    subprocess.run(
        ["cmake", "-S", str(_CPP_DIR), "-B", str(_BUILD_DIR),
         "-DCMAKE_BUILD_TYPE=Release"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(_BUILD_DIR), "-j"],
        check=True, capture_output=True,
    )
    return lib


def _np_ptr(a: np.ndarray):
    return a.ctypes.data_as(u64_p)


class NativeRuntime:
    """Handle on the loaded C++ runtime, mirroring the public API."""

    def __init__(self, lib_path: Optional[os.PathLike] = None):
        path = Path(lib_path) if lib_path else build_library()
        self.lib = ctypes.CDLL(str(path))
        self._keepalive: list = []
        L = self.lib
        for name, argtypes, restype in [
            ("hexl_tpu_acquire", [], None),
            ("hexl_tpu_release", [], None),
            ("hexl_tpu_set_worksize_dyadic_multiply", [ctypes.c_uint64], None),
            (
                "hexl_tpu_dyadic_multiply",
                [u64_p, u64_p, u64_p, ctypes.c_uint64, u64_p, ctypes.c_uint64],
                None,
            ),
            ("hexl_tpu_dyadic_multiply_completed", [], ctypes.c_int),
            ("hexl_tpu_set_worksize_keyswitch", [ctypes.c_uint64], None),
            (
                "hexl_tpu_keyswitch",
                [u64_p, u64_p] + [ctypes.c_uint64] * 5 + [u64_p, u64_pp, u64_p, u64_p],
                None,
            ),
            ("hexl_tpu_keyswitch_completed", [], ctypes.c_int),
            ("hexl_tpu_set_worksize_ntt", [ctypes.c_uint64], None),
            (
                "hexl_tpu_ntt",
                [u64_p, u64_p, u64_p, ctypes.c_uint64, ctypes.c_uint64],
                None,
            ),
            ("hexl_tpu_ntt_completed", [], ctypes.c_int),
            ("hexl_tpu_set_worksize_intt", [ctypes.c_uint64], None),
            (
                "hexl_tpu_intt",
                [u64_p, u64_p, u64_p] + [ctypes.c_uint64] * 4,
                None,
            ),
            ("hexl_tpu_intt_completed", [], ctypes.c_int),
            (
                "hexl_tpu_register_backend",
                [ctypes.POINTER(BackendV1)],
                None,
            ),
            (
                "hexl_tpu_register_backend_v2",
                [ctypes.POINTER(BackendV2)],
                None,
            ),
            (
                "hexl_tpu_minimal_primitive_root",
                [ctypes.c_uint64, ctypes.c_uint64],
                ctypes.c_uint64,
            ),
            (
                "hexl_tpu_make_ntt_tables",
                [ctypes.c_uint64, ctypes.c_uint64] + [u64_p] * 6,
                None,
            ),
            (
                "hexl_tpu_generate_primes",
                [ctypes.c_int, ctypes.c_int, ctypes.c_uint64, u64_p],
                ctypes.c_int,
            ),
        ]:
            fn = getattr(L, name)
            fn.argtypes = argtypes
            fn.restype = restype

    # ------------------------------------------------------------- API ----

    def acquire(self):
        self.lib.hexl_tpu_acquire()

    def release(self):
        self.lib.hexl_tpu_release()

    def dyadic_multiply(self, op1, op2, n, moduli, worksize_batch=None):
        """One or more dyadic multiplies; returns [3][n_moduli][n] array(s)."""
        moduli = np.ascontiguousarray(moduli, dtype=np.uint64)
        n_moduli = len(moduli)
        ops1 = op1 if isinstance(op1, list) else [op1]
        ops2 = op2 if isinstance(op2, list) else [op2]
        outs = [np.zeros(3 * n_moduli * n, dtype=np.uint64) for _ in ops1]
        self.lib.hexl_tpu_set_worksize_dyadic_multiply(len(ops1))
        keep = []
        for a, b, o in zip(ops1, ops2, outs):
            a = np.ascontiguousarray(a, dtype=np.uint64)
            b = np.ascontiguousarray(b, dtype=np.uint64)
            keep += [a, b]
            self.lib.hexl_tpu_dyadic_multiply(
                _np_ptr(o), _np_ptr(a), _np_ptr(b), n, _np_ptr(moduli), n_moduli
            )
        self.lib.hexl_tpu_dyadic_multiply_completed()
        return outs if isinstance(op1, list) else outs[0]

    def keyswitch(self, result, t_target, n, L, K, rns, comp, moduli,
                  k_switch_keys, modswitch_factors, twiddle_factors=None):
        result = np.ascontiguousarray(result, dtype=np.uint64).copy()
        t_target = np.ascontiguousarray(t_target, dtype=np.uint64)
        moduli = np.ascontiguousarray(moduli, dtype=np.uint64)
        msf = np.ascontiguousarray(modswitch_factors, dtype=np.uint64)
        keys = [np.ascontiguousarray(k, dtype=np.uint64) for k in k_switch_keys]
        key_arr = (u64_p * len(keys))(*[_np_ptr(k) for k in keys])
        tw = (
            np.ascontiguousarray(twiddle_factors, dtype=np.uint64)
            if twiddle_factors is not None
            else None
        )
        self.lib.hexl_tpu_set_worksize_keyswitch(1)
        self.lib.hexl_tpu_keyswitch(
            _np_ptr(result), _np_ptr(t_target), n, L, K, rns, comp,
            _np_ptr(moduli), key_arr, _np_ptr(msf),
            _np_ptr(tw) if tw is not None else None,
        )
        self.lib.hexl_tpu_keyswitch_completed()
        return result

    def ntt(self, operand, roots, precon, q, n):
        operand = np.ascontiguousarray(operand, dtype=np.uint64).copy()
        roots = np.ascontiguousarray(roots, dtype=np.uint64)
        precon = np.ascontiguousarray(precon, dtype=np.uint64)
        self.lib.hexl_tpu_set_worksize_ntt(1)
        self.lib.hexl_tpu_ntt(_np_ptr(operand), _np_ptr(roots), _np_ptr(precon), q, n)
        self.lib.hexl_tpu_ntt_completed()
        return operand

    def intt(self, operand, inv_roots, precon, q, inv_n, inv_n_w, n):
        operand = np.ascontiguousarray(operand, dtype=np.uint64).copy()
        inv_roots = np.ascontiguousarray(inv_roots, dtype=np.uint64)
        precon = np.ascontiguousarray(precon, dtype=np.uint64)
        self.lib.hexl_tpu_set_worksize_intt(1)
        self.lib.hexl_tpu_intt(
            _np_ptr(operand), _np_ptr(inv_roots), _np_ptr(precon), q,
            inv_n, inv_n_w, n,
        )
        self.lib.hexl_tpu_intt_completed()
        return operand

    def make_ntt_tables(self, n, q):
        fwd = np.zeros(n, dtype=np.uint64)
        fwd_p = np.zeros(n, dtype=np.uint64)
        inv = np.zeros(n, dtype=np.uint64)
        inv_p = np.zeros(n, dtype=np.uint64)
        inv_n = ctypes.c_uint64()
        inv_n_w = ctypes.c_uint64()
        self.lib.hexl_tpu_make_ntt_tables(
            n, q, _np_ptr(fwd), _np_ptr(fwd_p), _np_ptr(inv), _np_ptr(inv_p),
            ctypes.byref(inv_n), ctypes.byref(inv_n_w),
        )
        return fwd, fwd_p, inv, inv_p, inv_n.value, inv_n_w.value

    # ----------------------------------------------- accelerator backend --

    def register_jax_backend(self, pipelined: bool = True):
        """Install the JAX executors as the C++ runtime's accelerator backend.

        Callbacks run on C++ worker threads (ctypes reacquires the GIL); they
        read the op structs, run the batched XLA computations, and write the
        results back through the caller's pointers.  On a real accelerator
        the production tiers serve the ops (fused-Pallas dyadic multiply and
        keyswitch, MXU NTT); the pure-XLA compositions remain the CPU/
        emulation fallback.

        With ``pipelined`` (default) the split submit/finalize ABI v2 is
        registered as well: submit stages inputs and dispatches the XLA
        computation asynchronously, finalize fetches + demuxes — so the C++
        scheduler overlaps host staging of batch i+1 with device compute of
        batch i, the reference's ping-pong window
        (`host/src/fpga.cpp:1517-1545`).  The v1 blocking executors stay
        registered as the fallback for declined submits."""
        import jax

        from .ops import dyadic_jax, keyswitch_jax, ntt_jax

        accelerated = jax.default_backend() not in ("cpu",)

        def _view(ptr, count):
            return np.ctypeslib.as_array(ptr, shape=(count,))

        def run_dyadic(ctx, ops, count):
            try:
                n = ops[0].n
                M = ops[0].n_moduli
                moduli = _view(ops[0].moduli, M).copy()
                op1 = np.stack(
                    [_view(ops[i].operand1, 2 * M * n).reshape(2, M, n)
                     for i in range(count)]
                )
                op2 = np.stack(
                    [_view(ops[i].operand2, 2 * M * n).reshape(2, M, n)
                     for i in range(count)]
                )
                if accelerated and n % 128 == 0:
                    from .ops import dyadic_pallas

                    out = dyadic_pallas.runner(
                        tuple(int(q) for q in moduli), int(n)
                    ).run(op1, op2)
                else:
                    out = dyadic_jax.dyadic_multiply_batched(
                        op1, op2, np.broadcast_to(moduli, (count, M))
                    )
                out = np.asarray(out).reshape(count, -1)
                for i in range(count):
                    _view(ops[i].results, 3 * M * n)[:] = out[i]
                return 1
            except Exception:  # decline -> native fallback
                return 0

        def run_keyswitch(ctx, ops, count):
            try:
                o = ops[0]
                n, L, K = o.n, o.decomp_modulus_size, o.key_modulus_size
                comp = o.key_component_count
                moduli = _view(o.moduli, K).copy()
                tw = (
                    _view(o.twiddle_factors, K * 4 * n).copy()
                    if o.twiddle_factors
                    else None
                )
                if accelerated:
                    from .ops import keyswitch_tpu

                    kctx = keyswitch_tpu.get_context(
                        int(n), int(L), int(K), int(o.rns_modulus_size),
                        int(comp), moduli, tw,
                    )
                else:
                    kctx = keyswitch_jax.get_context(
                        int(n), int(L), int(K), int(o.rns_modulus_size),
                        int(comp), moduli, tw,
                    )
                keys = [
                    _view(o.k_switch_keys[i], comp * K * n).copy()
                    for i in range(L)
                ]
                msf = _view(o.modswitch_factors, K).copy()
                ts = np.stack(
                    [_view(ops[i].t_target, L * n) for i in range(count)]
                )
                rs = np.stack(
                    [_view(ops[i].result, comp * L * n)
                     for i in range(count)]
                )
                out = kctx.run_batch(rs, ts, keys, msf)
                for i in range(count):
                    _view(ops[i].result, comp * L * n)[:] = out[i]
                return 1
            except Exception:
                return 0

        def run_ntt(ctx, ops, count, inverse):
            try:
                o = ops[0]
                n, q = o.n, o.coeff_modulus
                operands = np.stack(
                    [_view(ops[i].operand, n) for i in range(count)]
                )
                roots = _view(o.root_powers, n).copy()
                precon = _view(o.precon_root_powers, n).copy()
                if accelerated and n >= 1024:
                    from .ops import nt as _nt, ntt_mxu_pallas

                    if inverse:
                        psi = _nt.inverse_mod(int(roots[1]), int(q))
                        fn = ntt_mxu_pallas.inv_ntt_fn(int(n), int(q), psi=psi)
                    else:
                        psi = int(roots[n >> 1])
                        fn = ntt_mxu_pallas.fwd_ntt_fn(int(n), int(q), psi=psi)
                    out = ntt_mxu_pallas._run(
                        fn, operands, int(q), ntt_mxu_pallas.DEFAULT_TILE_P
                    )
                elif inverse:
                    out = ntt_jax.inv_ntt_with_tables(
                        operands, int(q), roots, precon, int(o.inv_n),
                        int(o.inv_n_w),
                    )
                else:
                    out = ntt_jax.fwd_ntt_with_tables(
                        operands, int(q), roots, precon
                    )
                for i in range(count):
                    _view(ops[i].operand, n)[:] = out[i]
                return 1
            except Exception:
                return 0

        backend = BackendV1(
            run_dyadic_batch=DYADIC_CB(run_dyadic),
            run_keyswitch_batch=KEYSWITCH_CB(run_keyswitch),
            run_ntt_batch=NTT_CB(run_ntt),
            ctx=None,
        )
        self._keepalive.append(backend)  # callbacks must outlive the runtime
        self.lib.hexl_tpu_register_backend(ctypes.byref(backend))
        if not pipelined:
            return

        # ----------------------------------------------------- ABI v2 -----
        import itertools
        import threading

        from .ops import word64 as w
        from .utils.retry import call_with_retry

        pending: dict = {}  # handle -> finalize closure
        plock = threading.Lock()
        counter = itertools.count(1)

        def _register(fin) -> int:
            h = next(counter)
            with plock:
                pending[h] = fin
            return h

        def _res_views(ptrs_and_lens):
            return [
                np.ctypeslib.as_array(p, shape=(int(length),))
                for p, length in ptrs_and_lens
            ]

        def submit_dyadic(ctx, ops, count):
            try:
                n = int(ops[0].n)
                M = int(ops[0].n_moduli)
                moduli = _view(ops[0].moduli, M).copy()
                op1 = np.stack(
                    [_view(ops[i].operand1, 2 * M * n).reshape(2, M, n)
                     for i in range(count)]
                )
                op2 = np.stack(
                    [_view(ops[i].operand2, 2 * M * n).reshape(2, M, n)
                     for i in range(count)]
                )
                views = _res_views(
                    [(ops[i].results, 3 * M * n) for i in range(count)]
                )
                if accelerated and n % 128 == 0:
                    from .ops import dyadic_pallas

                    r = dyadic_pallas.runner(
                        tuple(int(q) for q in moduli), n
                    )
                    dev = r.dispatch(op1, op2)

                    def fin(dev=dev, r=r, views=views, count=count):
                        out = r._unstage(dev).reshape(count, -1)
                        for i, v in enumerate(views):
                            v[:] = out[i]
                else:
                    dev = dyadic_jax.dyadic_multiply_batched(
                        op1, op2, np.broadcast_to(moduli, (count, M))
                    )

                    def fin(dev=dev, views=views, count=count):
                        out = np.asarray(dev).reshape(count, -1)
                        for i, v in enumerate(views):
                            v[:] = out[i]

                return _register(fin)
            except Exception:  # decline -> v1 / native fallback
                return 0

        def submit_keyswitch(ctx, ops, count):
            try:
                o = ops[0]
                n, L, K = int(o.n), int(o.decomp_modulus_size), int(
                    o.key_modulus_size
                )
                comp = int(o.key_component_count)
                moduli = _view(o.moduli, K).copy()
                tw = (
                    _view(o.twiddle_factors, K * 4 * n).copy()
                    if o.twiddle_factors
                    else None
                )
                keys = [
                    _view(o.k_switch_keys[i], comp * K * n).copy()
                    for i in range(L)
                ]
                msf = _view(o.modswitch_factors, K).copy()
                ts = np.stack(
                    [_view(ops[i].t_target, L * n)
                     for i in range(count)]
                )
                rs = np.stack(
                    [_view(ops[i].result, comp * L * n)
                     for i in range(count)]
                )
                views = _res_views(
                    [(ops[i].result, comp * L * n) for i in range(count)]
                )
                if accelerated:
                    from .ops import keyswitch_tpu

                    kctx = keyswitch_tpu.get_context(
                        n, L, K, int(o.rns_modulus_size), comp, moduli, tw
                    )
                    dev32 = kctx.dispatch_batch32(rs, ts, keys, msf)

                    def fin(dev32=dev32, views=views, count=count):
                        out = w.from_interleaved_np(
                            np.asarray(dev32)
                        ).reshape(count, -1)
                        for i, v in enumerate(views):
                            v[:] = out[i]
                else:
                    kctx = keyswitch_jax.get_context(
                        n, L, K, int(o.rns_modulus_size), comp, moduli, tw
                    )
                    dev = kctx.dispatch_batch(rs, ts, keys, msf)

                    def fin(dev=dev, views=views, count=count):
                        out = w.from_pair_np(
                            np.asarray(dev[0]), np.asarray(dev[1])
                        ).reshape(count, -1)
                        for i, v in enumerate(views):
                            v[:] = out[i]

                return _register(fin)
            except Exception:
                return 0

        def submit_ntt(ctx, ops, count, inverse):
            try:
                o = ops[0]
                n, q = int(o.n), int(o.coeff_modulus)
                operands = np.stack(
                    [_view(ops[i].operand, n) for i in range(count)]
                )
                roots = _view(o.root_powers, n).copy()
                views = _res_views(
                    [(ops[i].operand, n) for i in range(count)]
                )
                if accelerated and n >= 1024:
                    from .ops import nt as _nt, ntt_mxu_pallas

                    if inverse:
                        psi = _nt.inverse_mod(int(roots[1]), q)
                        fn = ntt_mxu_pallas.inv_ntt_fn(n, q, psi=psi)
                    else:
                        psi = int(roots[n >> 1])
                        fn = ntt_mxu_pallas.fwd_ntt_fn(n, q, psi=psi)
                    tile_p = ntt_mxu_pallas.DEFAULT_TILE_P
                    flat = operands
                    pad = (-count) % tile_p
                    if pad:
                        flat = np.concatenate(
                            [flat, np.zeros((pad, n), flat.dtype)]
                        )
                    lo, hi = w.to_pair_np(flat)
                    dev = call_with_retry(fn, lo, hi)

                    def fin(dev=dev, views=views, count=count):
                        out = w.from_pair_np(
                            np.asarray(dev[0]), np.asarray(dev[1])
                        )[:count]
                        for i, v in enumerate(views):
                            v[:] = out[i]
                else:
                    precon = _view(o.precon_root_powers, n).copy()
                    if inverse:
                        out_np = ntt_jax.inv_ntt_with_tables(
                            operands, q, roots, precon, int(o.inv_n),
                            int(o.inv_n_w),
                        )
                    else:
                        out_np = ntt_jax.fwd_ntt_with_tables(
                            operands, q, roots, precon
                        )

                    def fin(out_np=out_np, views=views):
                        for i, v in enumerate(views):
                            v[:] = out_np[i]

                return _register(fin)
            except Exception:
                return 0

        def finalize(ctx, handle):
            with plock:
                fin = pending.pop(int(handle), None)
            if fin is None:
                return 0
            try:
                fin()
                return 1
            except Exception:
                # results untouched (writes happen only after the full
                # device->host fetch succeeded) -> scheduler reruns native
                return 0

        backend_v2 = BackendV2(
            submit_dyadic_batch=DYADIC_SUBMIT_CB(submit_dyadic),
            submit_keyswitch_batch=KEYSWITCH_SUBMIT_CB(submit_keyswitch),
            submit_ntt_batch=NTT_SUBMIT_CB(submit_ntt),
            finalize_batch=FINALIZE_CB(finalize),
            ctx=None,
        )
        self._keepalive.append(backend_v2)
        self.lib.hexl_tpu_register_backend_v2(ctypes.byref(backend_v2))

    def clear_backend(self):
        self.lib.hexl_tpu_register_backend(None)
        self.lib.hexl_tpu_register_backend_v2(None)
