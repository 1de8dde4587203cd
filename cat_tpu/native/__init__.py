"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA; these cover the host-side hot loops the
reference implements natively (Kaldi decoder etc.). Each component has
a pure-Python reference implementation as documentation + fallback.

Build lazily on first use: g++ -O3 -shared -fPIC (toolchain is in the
image; no pip installs).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> str:
    src = os.path.join(_DIR, name + ".cpp")
    lib = os.path.join(_DIR, "lib" + name + ".so")
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
             "-o", lib],
            check=True, capture_output=True)
    return lib


_wfst_lib = None


def wfst_lib():
    """ctypes handle to the native WFST decoder (builds on demand)."""
    global _wfst_lib
    if _wfst_lib is None:
        lib = ctypes.CDLL(_build("wfst_decoder"))
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.wfst_viterbi.restype = ctypes.c_int
        lib.wfst_viterbi.argtypes = [
            i32p, i32p, i32p, i32p, f32p, ctypes.c_int32,   # emit arcs
            i32p, i32p, i32p, f32p, ctypes.c_int32,          # eps arcs
            ctypes.c_int32, ctypes.c_int32, f32p,            # states
            f32p, ctypes.c_int32, ctypes.c_int32,            # logprobs
            ctypes.c_float, ctypes.c_int32, ctypes.c_float,  # beam...
            i32p, ctypes.c_int32, f32p,                      # outputs
        ]
        lib.wfst_nbest.restype = ctypes.c_int
        lib.wfst_nbest.argtypes = [
            i32p, i32p, i32p, i32p, f32p, ctypes.c_int32,   # emit arcs
            i32p, i32p, i32p, f32p, ctypes.c_int32,          # eps arcs
            ctypes.c_int32, ctypes.c_int32, f32p,            # states
            f32p, ctypes.c_int32, ctypes.c_int32,            # logprobs
            ctypes.c_float, ctypes.c_int32, ctypes.c_float,  # beam...
            ctypes.c_int32,                                  # K
            i32p, i32p, f32p, ctypes.c_int32,                # outputs
        ]
        _wfst_lib = lib
    return _wfst_lib
