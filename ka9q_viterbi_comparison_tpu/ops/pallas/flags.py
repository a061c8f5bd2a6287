"""Single source of truth for the ``KA9Q_TPU_*`` environment knobs.

Every behavior-changing environment variable the kernel layer reads lives
here, with its default and meaning; no other module may touch
``os.environ`` for a ``KA9Q_TPU_`` name (pinned by
``tests/test_flags.py``).  All knobs are read at *trace* time (inside the
first call for a given static configuration), so changing one mid-process
only affects not-yet-compiled configurations -- set them before first use
(tests that flip them use fresh static arguments).

This is the TPU analogue of the reference's compile-time config macros
(e.g. the SPIRAL ``RENORMALIZE_THRESHOLD`` block, spiral/spiral27.cpp:9-17):
rarely-touched implementation selectors, kept out of the public API.
"""

from __future__ import annotations

import os

__all__ = ["KNOBS", "inplace_mode", "inplace_unroll", "inplace_mxu",
           "inplace_pack_mxu", "inplace_chunk", "inplace_word_pack",
           "lk_depth", "lk2_tables", "lk2_residue", "k24_fields",
           "k24_walk"]

# name -> (default, meaning).  Keep in sync with README.md's knob table.
KNOBS: dict[str, tuple[str, str]] = {
    "KA9Q_TPU_INPLACE": (
        "auto",
        "Routing of 5 < K <= 15 through the in-place rotating-address "
        "kernel. auto: on at full lane groups when the metrics fit VMEM "
        "(measured fastest); 0: never; 1: force at any batch (tests pin "
        "coverage with this).",
    ),
    "KA9Q_TPU_INPLACE_UNROLL": (
        "1",
        "Chunk-loop unroll factor of the in-place kernel. 1 measured "
        "fastest on v5e (tools/unroll_sweep.py: 50.5 vs 45.6 Msym/s at 2).",
    ),
    "KA9Q_TPU_INPLACE_MXU": (
        "1",
        "Evaluate the in-place kernel's branch-penalty combos as one bf16 "
        "matmul per chunk on the MXU (exact: 0/1 parities x |coef|<=255 "
        "inputs, f32 accumulate) instead of ~R products + 4 signed "
        "accumulations on the VPU. The kernel is VPU-compute-bound at its "
        "real instruction mix, so offloading penalties to the idle MXU is "
        "the principal headroom (VERDICT r3 #4): measured K=15 B=256 on "
        "v5e, 83.5 vs 53.5 Msym/s at the old default chunk, bit-exact "
        "(tools/k15_chunk_sweep.py). The kernel additionally gates the "
        "path on S >= 2048: at K=7/9 (32/128 pairs total) the matmul "
        "overhead LOSES 6-12 % (A/B via SWEEP_CODE). 0: VPU combo path.",
    ),
    "KA9Q_TPU_INPLACE_CHUNK": (
        "1024",
        "State-chunk rows per inner-loop iteration of the in-place kernel "
        "(live-range bound for Mosaic's register allocator; the whole-array "
        "form spilled 254 MiB at K=15). Swept on v5e with the MXU penalty "
        "path (tools/k15_chunk_sweep.py): 74.8/83.5/82.9 Msym/s at "
        "512/1024/2048; 4096 faults the TPU worker (Mosaic kernel crash) "
        "and 16384 does not finish compiling -- keep <= 2048.",
    ),
    "KA9Q_TPU_INPLACE_PACK_MXU": (
        "0",
        "Pack decision words in the in-place kernel as two exact bf16 "
        "matmuls (16-bit weight halves, f32 accumulate) against a static "
        "banded weight matrix instead of the multiply-by-2^g sublane "
        "reduction on the VPU. MEASURED LOSS, default off: 65.9 vs 83.5 "
        "Msym/s at K=15 B=256 (tools/k15_chunk_sweep.py with this flag) -- "
        "the two extra matmuls per chunk serialize against the penalty "
        "matmul on the single MXU and the bf16 cast of the [CH, B] "
        "decision tile eats the VPU saving. Kept as an A/B hook.",
    ),
    "KA9Q_TPU_LK_DEPTH": (
        "4",
        "Trellis steps fused per launch in the state-blocked large-K "
        "family: 4 routes R<=2 codes through ops/pallas/large_k4.py (one "
        "metric-tensor HBM crossing and one column re-interleave per QUAD); "
        "2 keeps the depth-2 pair kernel everywhere. R>2 codes always use "
        "depth 2.",
    ),
    "KA9Q_TPU_LK2_TABLES": (
        "1",
        "Stream static branch-parity tables in the depth-2 large-K kernel "
        "(R <= 2 only). Measured time-identical to the in-kernel parity "
        "fold at K=24 (tools/k24_sweep.py); kept default-on. 0: fold path.",
    ),
    "KA9Q_TPU_INPLACE_WORD_PACK": (
        "0",
        "In the in-place kernel's strided phases with 2^j >= 32, pack each "
        "butterfly half's decisions separately and interleave at WORD "
        "granularity (32x smaller shuffle than restacking element rows). "
        "A/B lever for the K=15 residual costs (VERDICT r4 item 3): "
        "MEASURED neutral-to-slight-loss on v5e (83.4 vs 85.0 Msym/s at "
        "K=15 B=256, tools/k15_chunk_sweep.py SWEEP_WORD_PACK=0,1) -- the "
        "element restack was not the binding cost. Default off.",
    ),
    "KA9Q_TPU_K24_FIELDS": (
        "1",
        "Emit the width-4 walk-field table directly from the depth-4 "
        "large-K kernel (one extra select per ACS level) instead of "
        "building it from decision words in XLA after the update "
        "(ops/radix_planes.py build_plane_tables). Removes the ~73 ms "
        "radix-repack surcharge from the K=24 update phase; requires the "
        "depth-4 route (R <= 2) and a window span T - (K-1) divisible by "
        "4 (every reference frame). 0: words + XLA repack route.",
    ),
    "KA9Q_TPU_K24_WALK": (
        "8",
        "Walk width of the kernel-emitted K=24 field tables: 8 pairs the "
        "depth-4 quads (first quad emits f4, second consumes it and emits "
        "byte-packed F_8) so the traceback retires EIGHT steps per "
        "dependent fetch; 4 emits f4 every quad (shorter kernel, 2x the "
        "walk rounds). Default from the measured A/B in "
        "tools/k24_fields_probe.py. Only meaningful with "
        "KA9Q_TPU_K24_FIELDS=1.",
    ),
    "KA9Q_TPU_LK2_RESIDUE": (
        "0",
        "Carry the K=24 metric tensor between pairs in mod-4 column-residue "
        "form (skips the XLA re-interleave). Bit-exact in interpret mode "
        "but BLOCKED on the current Mosaic toolchain (4:1 lane interleave "
        "fails to lower; ops/pallas/large_k2.py). 1: enable anyway.",
    ),
}


def _get(name: str) -> str:
    default, _ = KNOBS[name]
    return os.environ.get(name, default)


def inplace_mode() -> str:
    """``"auto"``, ``"off"`` (=0) or ``"force"`` (=1)."""
    v = _get("KA9Q_TPU_INPLACE")
    return {"0": "off", "1": "force"}.get(v, "auto")


def inplace_unroll() -> int:
    return max(1, int(_get("KA9Q_TPU_INPLACE_UNROLL")))


def inplace_mxu() -> bool:
    return _get("KA9Q_TPU_INPLACE_MXU") != "0"


def inplace_pack_mxu() -> bool:
    return _get("KA9Q_TPU_INPLACE_PACK_MXU") == "1"


def inplace_chunk() -> int:
    return max(32, int(_get("KA9Q_TPU_INPLACE_CHUNK")))


def lk_depth() -> int:
    return 4 if _get("KA9Q_TPU_LK_DEPTH") != "2" else 2


def lk2_tables() -> bool:
    return _get("KA9Q_TPU_LK2_TABLES") != "0"


def lk2_residue() -> bool:
    return _get("KA9Q_TPU_LK2_RESIDUE") == "1"


def k24_fields() -> bool:
    return _get("KA9Q_TPU_K24_FIELDS") != "0"


def inplace_word_pack() -> bool:
    return _get("KA9Q_TPU_INPLACE_WORD_PACK") == "1"


def k24_walk() -> int:
    return 4 if _get("KA9Q_TPU_K24_WALK") == "4" else 8
