"""hexl-fpga_tpu: a TPU-native homomorphic-encryption primitive library.

Built from scratch in JAX/XLA/Pallas with the capabilities of Intel
HEXL-FPGA (intel/hexl-fpga): batched negacyclic NTT/INTT, dyadic
ciphertext multiplication, and BGV/CKKS-style KeySwitch over word-sized
primes, behind the same asynchronous worksize/Completed host API.

Public surface mirrors `host/inc/hexl-fpga.h`; see `hexl_fpga_tpu.api`.
"""

from .api import (  # noqa: F401
    DyadicMultiply,
    DyadicMultiplyCompleted,
    KeySwitch,
    KeySwitchCompleted,
    _INTT,
    _INTTCompleted,
    _NTT,
    _NTTCompleted,
    _set_worksize_INTT,
    _set_worksize_NTT,
    acquire_FPGA_resources,
    acquire_TPU_resources,
    release_FPGA_resources,
    release_TPU_resources,
    set_worksize_DyadicMultiply,
    set_worksize_KeySwitch,
)

__version__ = "0.1.0"
