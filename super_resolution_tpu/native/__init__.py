"""Native (C++) runtime components, bound via ctypes.

The reference's native layer is CUDA compute kernels (basicsr/ops/*); the
TPU compute path replaces those with Pallas/XLA. What stays native here is
the IO runtime: RawPack, a decode-free mmap dataset with a parallel crop
sampler (the LMDB-pipeline replacement).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_LIB = None


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "librawpack.so")


def build_native(force: bool = False) -> str:
    """Compile rawpack.cpp -> librawpack.so (cached; g++ -O3)."""
    src = os.path.join(os.path.dirname(__file__), "rawpack.cpp")
    out = _lib_path()
    if force or not os.path.exists(out) or (os.path.getmtime(out)
                                            < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             src, "-o", out], check=True)
    return out


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_native())
        lib.rawpack_open.restype = ctypes.c_void_p
        lib.rawpack_open.argtypes = [ctypes.c_char_p]
        lib.rawpack_len.restype = ctypes.c_int64
        lib.rawpack_len.argtypes = [ctypes.c_void_p]
        lib.rawpack_info.restype = ctypes.c_int
        lib.rawpack_info.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.POINTER(ctypes.c_int64)]
        lib.rawpack_read.restype = ctypes.c_int
        lib.rawpack_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p]
        lib.rawpack_crop_batch.restype = ctypes.c_int
        lib.rawpack_crop_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64]
        lib.rawpack_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB
