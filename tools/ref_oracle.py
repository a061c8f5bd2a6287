"""ctypes loader for the reference-decoder oracle shim.

Compiles the REFERENCE's unmodified decoder sources (read directly from
``/root/reference``; nothing is vendored) together with
``native/ref_oracle_shim.cpp`` into a shared library, exposing one
``decode`` entry per family.  This is the *external* oracle VERDICT r4
item 2 asked for: bit-exactness claims are checked against the actual
ka9q/SPIRAL binaries, not in-repo reimplementations.

Used by ``tests/test_reference_oracle.py`` (skips when the reference tree
or a C++ toolchain is absent) and ``tools/parity_probe.py`` (the measured
agreement numbers in PARITY.md).
"""

from __future__ import annotations

import ctypes
import functools
import os
import pathlib
import subprocess

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_DIR = pathlib.Path(os.environ.get("KA9Q_REF_DIR", "/root/reference"))
SHIM = REPO / "native" / "ref_oracle_shim.cpp"

# family -> (shim symbol, K, R, extra reference sources)
FAMILIES = {
    "v27": ("ref_decode_v27", 7, 2, ["ka9q_libfec_port/viterbi27_sse2.cpp"]),
    "v29": ("ref_decode_v29", 9, 2, ["ka9q_libfec_port/viterbi29_sse2.cpp"]),
    "v615": ("ref_decode_v615", 15, 6,
             ["ka9q_libfec_port/viterbi615_sse2.cpp"]),
    # reference update + the INTENDED walk: the shipped v615 chainback
    # mis-indexes its decision union on LP64 (8-byte long) platforms --
    # see native/ref_oracle_shim.cpp.
    "v615_fixed": ("ref_decode_v615_fixed", 15, 6,
                   ["ka9q_libfec_port/viterbi615_sse2.cpp"]),
    "v224": ("ref_decode_v224", 24, 2,
             ["ka9q_libfec_port/viterbi224_sse2.cpp"]),
    "spiral27": ("ref_decode_spiral27", 7, 2, ["spiral/spiral27.cpp"]),
    "spiral29": ("ref_decode_spiral29", 9, 2, ["spiral/spiral29.cpp"]),
    "spiral47": ("ref_decode_spiral47", 7, 4, ["spiral/spiral47.cpp"]),
    "spiral49": ("ref_decode_spiral49", 9, 4, ["spiral/spiral49.cpp"]),
    "spiral615": ("ref_decode_spiral615", 15, 6, ["spiral/spiral615.cpp"]),
}

_SOURCES = sorted({src for _, _, _, srcs in FAMILIES.values() for src in srcs})


def available() -> bool:
    if not SHIM.exists():
        return False
    if not all((REF_DIR / s).exists() for s in _SOURCES):
        return False
    from shutil import which

    return which("g++") is not None


@functools.lru_cache(maxsize=1)
def load() -> ctypes.CDLL:
    """Build (if stale) and load the oracle library."""
    if not available():
        raise RuntimeError("reference tree or g++ unavailable")
    build_dir = REPO / ".ref_oracle_cache"
    build_dir.mkdir(exist_ok=True)
    so = build_dir / "ref_oracle.so"
    deps = [SHIM] + [REF_DIR / s for s in _SOURCES]
    if not so.exists() or so.stat().st_mtime < max(
            d.stat().st_mtime for d in deps):
        cmd = [
            "g++", "-O2", "-march=native", "-fPIC", "-shared",
            f"-I{REF_DIR}", str(SHIM),
            *[str(REF_DIR / s) for s in _SOURCES], "-o", str(so),
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    lib = ctypes.CDLL(str(so))
    for sym, _, _, _ in FAMILIES.values():
        fn = getattr(lib, sym)
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_uint,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        fn.restype = ctypes.c_int
    return lib


def decode(family: str, polys, syms_u8: np.ndarray, ndata_bits: int,
           endstate: int = 0) -> tuple[np.ndarray, int]:
    """Run the reference family's full 3-phase lifecycle over one frame.

    ``syms_u8``: offset-binary u8 symbols, ``(ndata_bits + K - 1) * R``
    of them.  Returns ``(decoded bytes [ndata_bits // 8], chainback rc)``.
    """
    sym, K, R, _ = FAMILIES[family]
    syms_u8 = np.ascontiguousarray(syms_u8, dtype=np.uint8).ravel()
    assert syms_u8.size == (ndata_bits + K - 1) * R, syms_u8.size
    out = np.zeros(ndata_bits // 8 + 4, dtype=np.uint8)
    poly_arr = (ctypes.c_int * len(polys))(*polys)
    fn = getattr(load(), sym)
    rc = fn(poly_arr, syms_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ndata_bits, ctypes.c_uint(endstate & 0xFFFFFFFF),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out[: ndata_bits // 8].copy(), rc


def v224_true_endstate(data: np.ndarray) -> int:
    """The endstate the v224 chainback needs for full recovery: the last
    K-1 data bits still in the encoder register, newest bit at LSB
    (measured; the harness's ``endstate=0`` call discards them --
    ref: src/ka9q_interface.h:53-55, viterbi224_sse2.cpp:93-105)."""
    bits = np.unpackbits(np.asarray(data, dtype=np.uint8).ravel())
    es = 0
    for j in range(23):
        es |= int(bits[-1 - j]) << j
    return es
