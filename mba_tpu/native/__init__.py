"""Native (C++) runtime components, loaded via ctypes.

The only native component in the reference is the Teensy firmware
(SURVEY.md §2.4); the host-side counterpart here is a C++ serial
line-protocol parser + lock-free ring buffer (serialshim.cpp) compiled on
first use with the system g++ and bound through ctypes (pybind11 is not
available in this image).
"""
from mba_tpu.native.build import load_serialshim  # noqa: F401
