"""ctypes bindings for the native host decoder (native/viterbi_host.cpp).

The shared library is built on demand with g++ -O3 and cached next to the
source; environments without a toolchain simply report the backend as
unavailable (callers gate on ``available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..configs import CodeSpec, NumericSpec

__all__ = ["available", "encode", "decode", "bit_errors", "HostDecoder"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "viterbi_host.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libviterbi_host.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            ):
                os.makedirs(os.path.dirname(_LIB), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", _SRC, "-o", _LIB],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.vit_host_encode.restype = ctypes.c_long
            lib.vit_host_encode.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.vit_host_decode.restype = ctypes.c_long
            lib.vit_host_decode.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ]
            lib.vit_host_bit_errors.restype = ctypes.c_long
            lib.vit_host_bit_errors.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_long,
            ]
            lib.vit_host_create.restype = ctypes.c_void_p
            lib.vit_host_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_long,
            ]
            lib.vit_host_init.restype = None
            lib.vit_host_init.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.vit_host_update.restype = None
            lib.vit_host_update.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ]
            lib.vit_host_chainback.restype = ctypes.c_long
            lib.vit_host_chainback.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.c_int,
            ]
            lib.vit_host_delete.restype = None
            lib.vit_host_delete.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def _polys_arr(code: CodeSpec) -> np.ndarray:
    return np.asarray(code.polys, dtype=np.int32)


def encode(code: CodeSpec, numeric: NumericSpec, data: np.ndarray) -> np.ndarray:
    """Encode one frame [N] uint8 -> soft symbols [T*R] int32."""
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(code.total_symbols(len(data)), dtype=np.int32)
    polys = _polys_arr(code)
    n = lib.vit_host_encode(
        code.K, code.R, polys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        numeric.soft_high, numeric.soft_low,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n != len(out):
        raise RuntimeError(f"native encode failed: {n}")
    return out


def decode(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: np.ndarray,
    n_bytes: int,
    starting_state: int = 0,
    endstate: int = 0,
) -> tuple[np.ndarray, int]:
    """Decode one frame of soft symbols [T*R] -> ([n_bytes] uint8, path_metric)."""
    lib = _load()
    assert lib is not None
    symbols = np.ascontiguousarray(symbols, dtype=np.int32)
    out = np.zeros(n_bytes, dtype=np.uint8)
    polys = _polys_arr(code)
    pm = lib.vit_host_decode(
        code.K, code.R, polys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(symbols),
        numeric.soft_high, numeric.soft_low, numeric.initial_margin,
        starting_state, endstate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_bytes,
    )
    if pm < 0:
        raise RuntimeError(f"native decode failed: {pm}")
    return out, int(pm)


class HostDecoder:
    """Stateful native decoder with the reference's 3-phase lifecycle
    (reset / update / chainback, ref: src/ka9q_interface.h:45-55), one frame
    at a time -- the ``cpu_native`` benchmark family."""

    def __init__(self, code: CodeSpec, numeric: NumericSpec, max_steps: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native backend unavailable")
        self._lib = lib
        self.code = code
        self._polys = _polys_arr(code)
        self._h = lib.vit_host_create(
            code.K, code.R,
            self._polys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            numeric.soft_high, numeric.soft_low, numeric.initial_margin,
            max_steps,
        )
        if not self._h:
            raise RuntimeError("vit_host_create failed")

    def reset(self, starting_state: int = 0) -> None:
        self._lib.vit_host_init(self._h, starting_state)

    def update(self, symbols: np.ndarray) -> None:
        symbols = np.ascontiguousarray(symbols, dtype=np.int32)
        self._lib.vit_host_update(
            self._h, symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            symbols.size,
        )

    def chainback(self, n_bytes: int, endstate: int = 0) -> tuple[np.ndarray, int]:
        out = np.zeros(n_bytes, dtype=np.uint8)
        pm = self._lib.vit_host_chainback(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_bytes, endstate,
        )
        return out, int(pm)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.vit_host_delete(h)
            self._h = None


def bit_errors(a: np.ndarray, b: np.ndarray) -> int:
    lib = _load()
    assert lib is not None
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    assert a.size == b.size
    return int(lib.vit_host_bit_errors(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), a.size,
    ))
