"""Native (C++) runtime components, loaded via ctypes.

The only native component in the reference is the Teensy firmware
(SURVEY.md §2.4); the host-side counterparts here are compiled on first
use with the system g++ and bound through ctypes (pybind11 is not
available in this image):

- serialshim.cpp — serial line-protocol parser + lock-free ring buffer
  backing the acquisition layer;
- quantshim.cpp — per-channel int16 upload quantizer (memory-bandwidth
  two-pass SIMD) feeding the reduced-precision host→device transfer
  paths of the coherence/null engines.
"""
from mba_tpu.native.build import (load_serialshim,  # noqa: F401
                                  load_quantshim,
                                  quantize_int16_per_channel,
                                  quantize_int8_per_channel)
