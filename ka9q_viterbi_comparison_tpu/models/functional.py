"""Pure functional decode pipeline (single jitted program).

The stateful ``ViterbiDecoder`` mirrors the reference's three-phase lifecycle
for phase-level timing parity (ref: src/main.cpp:175-189); this module is the
fused alternative the TPU actually wants when phase attribution doesn't
matter: reset + update + chainback composed into ONE jitted function so XLA
can overlap branch-metric matmuls, the ACS scan and traceback without host
round-trips between phases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import CodeSpec, NumericSpec
from ..ops import acs, chainback as cb

__all__ = ["decode_fn", "decode_symbols"]


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def decode_symbols(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    num_data_bits: int,
    fused_penalties: bool | None = None,
) -> jnp.ndarray:
    """Decode tail-terminated frames ``[B, T*R]`` int32 -> bytes
    ``[B, num_data_bits // 8]`` uint8 in one compiled program.

    ``fused_penalties=None`` auto-selects: large trellises (K > 15) must
    compute penalties inside the scan (the whole-frame penalty tensor is
    [T, B, 4, S/2] -- tens of GB for K=24).
    """
    if fused_penalties is None:
        fused_penalties = True  # whole-frame penalty tensor is O(T*B*2S)
    B = symbols.shape[0]
    symbols = symbols.reshape(B, -1, code.R).astype(jnp.int32)
    metrics = acs.init_metrics(code, numeric, B)
    _, words, _ = acs.acs_update(code, numeric, metrics, symbols, fused_penalties)
    return cb.chainback(code, words, num_data_bits)


def decode_fn(code: CodeSpec, numeric: NumericSpec, num_data_bits: int):
    """Return a jittable ``symbols [B, T*R] -> bytes`` closure over static args."""
    fused = True

    def fn(symbols: jnp.ndarray) -> jnp.ndarray:
        return decode_symbols(code, numeric, symbols, num_data_bits, fused)

    return fn
