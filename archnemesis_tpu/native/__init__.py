"""ctypes bindings for the framework's native (C++) runtime components.

The compute path is JAX/XLA/Pallas on TPU; the CPU-side runtime around it —
here, the fixed-width catalogue decoder feeding the LBL line blocks — is
C++ (``native/src/fixed_width.cpp``), loaded via ctypes (no pybind11). The
shared library is built on demand with g++ the first time it is needed and
cached next to this file; every consumer has a pure-numpy fallback, so the
package works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_libansio.so")
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(_HERE)), "native", "src",
    "fixed_width.cpp",
)
_ABI_VERSION = 1

_lock = threading.Lock()
_lib = None
_tried = False

# field kinds understood by ans_parse_fixed
KIND_F64 = 0
KIND_I32 = 1
KIND_ISO_CHAR = 2


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-march=native", "-std=c++17",
        "-fPIC", "-shared", "-pthread", "-o", _SO_PATH, _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        if lib.ans_abi_version() != _ABI_VERSION:
            # stale build from an older source revision: rebuild once
            if not _build():
                return None
            lib = ctypes.CDLL(_SO_PATH)
            if lib.ans_abi_version() != _ABI_VERSION:
                return None
        lib.ans_parse_fixed.restype = ctypes.c_int64
        lib.ans_parse_fixed.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native decoder is loadable (building it if needed)."""
    return _load() is not None


def parse_fixed(buf: bytes, stride: int, cols, nthreads: int = 0):
    """Decode fixed-width records with the C++ engine.

    buf    : raw bytes, nlines * stride long (records + newline padding)
    stride : record width including the newline
    cols   : list of (name, start, stop, kind) with kind in
             {KIND_F64, KIND_I32, KIND_ISO_CHAR}
    Returns {name: (nlines,) ndarray}; raises RuntimeError when the library
    is unavailable, ValueError on malformed numeric fields.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fixed-width decoder unavailable")
    nlines = len(buf) // stride
    if nlines * stride != len(buf):
        raise ValueError(
            f"buffer length {len(buf)} not a multiple of stride {stride}"
        )

    nf = len(cols)
    starts = np.array([c[1] for c in cols], dtype=np.int32)
    widths = np.array([c[2] - c[1] for c in cols], dtype=np.int32)
    kinds = np.array([c[3] for c in cols], dtype=np.int32)
    outs = {}
    ptrs = (ctypes.c_void_p * nf)()
    for i, (name, _, _, kind) in enumerate(cols):
        arr = np.empty(
            nlines, dtype=np.float64 if kind == KIND_F64 else np.int32
        )
        outs[name] = arr
        ptrs[i] = arr.ctypes.data_as(ctypes.c_void_p).value

    errs = lib.ans_parse_fixed(
        ctypes.c_char_p(buf), stride, nlines, nf,
        starts.ctypes.data_as(ctypes.c_void_p),
        widths.ctypes.data_as(ctypes.c_void_p),
        kinds.ctypes.data_as(ctypes.c_void_p),
        ptrs, nthreads,
    )
    if errs:
        raise ValueError(f"{errs} malformed fields in fixed-width decode")
    return outs
