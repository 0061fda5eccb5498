"""52-bit wire packing for host<->device ciphertext transport.

Every value this library moves across the host link is a residue below a
<= 52-bit modulus (`hexl-fpga.h` contract: moduli in [2^16, 2^52]), but the
natural transport layout spends 64 bits per coefficient.  Packing to the
52-bit payload cuts wire bytes by 13/16 (-19%), which matters whenever the
host link — not compute — is the bottleneck (PCIe-attached hosts under
heavy fan-in; the tunneled environment's ~50 MB/s wire especially).

Value-domain contract: every packed value must be < 2^52 (the library
transports canonical residues of <= 52-bit moduli).  Out-of-domain bits
are MASKED OFF (both codecs), so a contract violation corrupts only the
offending coefficient — it cannot bleed into its neighbor's field.

Scheme: groups of 8 coefficients (8 x 52 = 416 bits = 13 u32 words).  The
codec is generated once from the bit layout and applied identically with
numpy (host side) and jax.numpy (device side), so pack(host)->unpack(device)
and pack(device)->unpack(host) are exact inverses by construction.

Layout reference: the reference packs 52-bit keys 3-per-2x256-bit word with
bitfield structs host-side (`host/inc/fpga.h:38-68`, `fpga.cpp:1167-1247`);
this is the same idea applied to the transport stream.
"""

from __future__ import annotations

import numpy as np

BITS = 52
GROUP = 8                      # coefficients per pack group
WORDS_IN = 2 * GROUP           # interleaved u32 words in (lo, hi pairs)
WORDS_OUT = BITS * GROUP // 32  # 13 packed u32 words


def _pack_terms():
    """Per packed word w: list of (source interleaved-word index, shift)."""
    terms = [[] for _ in range(WORDS_OUT)]
    for j in range(GROUP):
        for idx, base, width in (
            (2 * j, BITS * j, 32),           # lo word: value bits [0, 32)
            (2 * j + 1, BITS * j + 32, 20),  # hi word: value bits [32, 52)
        ):
            w0 = base // 32
            w1 = (base + width - 1) // 32
            for w in range(w0, w1 + 1):
                terms[w].append((idx, base - 32 * w))
    return terms


def _unpack_terms():
    """Per interleaved word: (packed word index, shift, needs_second, mask)."""
    out = []
    for j in range(GROUP):
        for base, width, mask in (
            (BITS * j, 32, 0xFFFFFFFF),
            (BITS * j + 32, 20, 0xFFFFF),
        ):
            w0 = base // 32
            sh = base - 32 * w0
            out.append((w0, sh, sh + width > 32, mask))
    return out


_PACK = _pack_terms()
_UNPACK = _unpack_terms()


def _pack(x, xp):
    """(..., 2n) interleaved u32 (52-bit values) -> (..., 13n/8) packed."""
    n2 = x.shape[-1]
    assert n2 % WORDS_IN == 0
    g = x.reshape(x.shape[:-1] + (n2 // WORDS_IN, WORDS_IN))
    outs = []
    for tlist in _PACK:
        acc = None
        for idx, sh in tlist:
            v = g[..., idx]
            if idx % 2:  # hi word: only 20 payload bits — mask so an
                # out-of-domain value (>= 2^52) corrupts itself, never its
                # neighbor's field (same contract as the native codec)
                v = v & np.uint32(0xFFFFF)
            t = (v << np.uint32(sh)) if sh >= 0 else (v >> np.uint32(-sh))
            acc = t if acc is None else acc | t
        outs.append(acc)
    out = xp.stack(outs, axis=-1)
    return out.reshape(x.shape[:-1] + (n2 // WORDS_IN * WORDS_OUT,))


def _unpack(p, xp):
    """(..., 13n/8) packed u32 -> (..., 2n) interleaved (52-bit values)."""
    m = p.shape[-1]
    assert m % WORDS_OUT == 0
    g = p.reshape(p.shape[:-1] + (m // WORDS_OUT, WORDS_OUT))
    outs = []
    for w0, sh, second, mask in _UNPACK:
        v = g[..., w0] >> np.uint32(sh)
        if second:
            v = v | (g[..., w0 + 1] << np.uint32(32 - sh))
        outs.append(v & np.uint32(mask))
    out = xp.stack(outs, axis=-1)
    return out.reshape(p.shape[:-1] + (m // WORDS_OUT * WORDS_IN,))


_NATIVE = None


def _native():
    """ctypes handle on the native codec (cpp/src/capi.cpp pack52/unpack52)
    if the C++ library is already built; None -> numpy fallback.  The
    native loop runs at memory bandwidth where the 26-pass numpy codec
    costs more host CPU than the packed bytes save on the wire."""
    global _NATIVE
    if _NATIVE is None:
        try:
            import ctypes

            from ..cpp_bridge import _BUILD_DIR, _LIB_NAME

            lib_path = _BUILD_DIR / _LIB_NAME
            if not lib_path.exists():
                _NATIVE = False
                return None
            lib = ctypes.CDLL(str(lib_path))
            u64p = ctypes.POINTER(ctypes.c_uint64)
            u32p = ctypes.POINTER(ctypes.c_uint32)
            lib.hexl_tpu_pack52.argtypes = [u64p, u32p, ctypes.c_uint64]
            lib.hexl_tpu_unpack52.argtypes = [u32p, u64p, ctypes.c_uint64]
            _NATIVE = lib
        except Exception:
            _NATIVE = False
    return _NATIVE or None


def pack_np(x32: np.ndarray) -> np.ndarray:
    x32 = np.ascontiguousarray(x32, dtype=np.uint32)
    assert x32.shape[-1] % WORDS_IN == 0, "last dim must be 16*k u32 words"
    lib = _native()
    if lib is not None:
        import ctypes

        out = np.empty(x32.shape[:-1] + (x32.shape[-1] * 13 // 16,),
                       dtype=np.uint32)
        total = x32.size // 2
        lib.hexl_tpu_pack52(
            x32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_uint64(total),
        )
        return out
    return _pack(x32, np)


def unpack_np(p32: np.ndarray) -> np.ndarray:
    p32 = np.ascontiguousarray(p32, dtype=np.uint32)
    assert p32.shape[-1] % WORDS_OUT == 0, "last dim must be 13*k u32 words"
    lib = _native()
    if lib is not None:
        import ctypes

        out = np.empty(p32.shape[:-1] + (p32.shape[-1] * 16 // 13,),
                       dtype=np.uint32)
        total = out.size // 2
        lib.hexl_tpu_unpack52(
            p32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_uint64(total),
        )
        return out
    return _unpack(p32, np)


def pack_jnp(x32):
    import jax.numpy as jnp

    return _pack(x32, jnp)


def unpack_jnp(p32):
    import jax.numpy as jnp

    return _unpack(p32, jnp)
