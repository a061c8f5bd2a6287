"""User-facing decoder models.

``ViterbiDecoder`` reproduces the reference's uniform three-phase decoder
lifecycle -- ``reset() -> update(symbols) -> chainback(bits)`` -- that every
decoder family is normalised to (ref: src/ka9q_interface.h:45-55,
src/main.cpp:175-189), as a thin stateful shell over pure jitted functions.
The shell owns device arrays (path metrics, accumulated decision words) so
phases can be timed independently exactly like the reference harness times
them; all compute lives in ``ops``.

Backends:

* ``"jnp"``    -- the portable `lax.scan` path (ops.acs / ops.chainback).
* ``"pallas"`` -- fused VMEM-resident TPU kernels (ops.pallas), falling back
                  to interpreter mode off-TPU.

The batch axis B is the throughput axis: one ``ViterbiDecoder`` decodes B
independent frames per lifecycle, replacing the reference's one-frame-at-a-time
loop (ref: src/main.cpp:168) with the data-parallel unit the TPU wants.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..configs import CodeSpec, NumericSpec
from ..ops import acs, chainback as cb

__all__ = ["ViterbiDecoder", "decode_frames"]


@dataclasses.dataclass
class ViterbiDecoder:
    """Batched stateful Viterbi decoder with the reference's 3-phase contract.

    Example::

        dec = ViterbiDecoder(VITERBI27, soft8_spec(2), batch=64)
        dec.reset()
        dec.update(symbols)             # [64, T*R] int32, may be called in blocks
        data = dec.chainback(8192)      # [64, 1024] uint8
    """

    code: CodeSpec
    numeric: NumericSpec
    batch: int
    backend: str = "jnp"

    def __post_init__(self) -> None:
        if self.backend not in ("jnp", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.backend == "pallas":
            from ..ops.pallas import dispatch as pallas_dispatch

            self._pallas = pallas_dispatch
        self.reset()

    # -- phase 1: reset (ref: init_viterbi27_sse2, viterbi27_sse2.cpp:42-53) --
    def reset(self, starting_state: int = 0) -> None:
        self.metrics = acs.init_metrics(self.code, self.numeric, self.batch, starting_state)
        self.renorm_offset = jnp.zeros((self.batch,), dtype=jnp.int32)
        self._decision_blocks: list[jnp.ndarray] = []
        self._steps = 0  # trellis steps consumed (blockwise resume cursor)

    # -- phase 2: symbol update (ref: update_viterbi27_blk_sse2) --
    def update(self, symbols: jnp.ndarray) -> None:
        """Consume ``[B, n*R]`` (or ``[B, n, R]``) soft symbols; resumable in
        blocks like the reference's update (viterbi27_sse2.cpp:119)."""
        if symbols.ndim == 2:
            symbols = symbols.reshape(self.batch, -1, self.code.R)
        symbols = symbols.astype(jnp.int32)
        if self.backend == "pallas":
            # t0 keeps the in-place kernel's rotation phases (and decision
            # packing positions) globally consistent across blocks.
            self.metrics, words, off = self._pallas.acs_update(
                self.code, self.numeric, self.metrics, symbols, self._steps
            )
        else:
            fused = True  # in-scan penalties; whole-frame tensor is O(T*B*2S)
            self.metrics, words, off = acs.acs_update(
                self.code, self.numeric, self.metrics, symbols, fused
            )
        self.renorm_offset = self.renorm_offset + off
        self._decision_blocks.append(words)
        self._steps += symbols.shape[1]

    # -- phase 3: chainback (ref: chainback_viterbi27_sse2) --
    def chainback(self, num_data_bits: int, endstate: int = 0) -> jnp.ndarray:
        """Decode ``[B, num_data_bits // 8]`` uint8 from the accumulated
        decision history."""
        words = (
            self._decision_blocks[0]
            if len(self._decision_blocks) == 1
            else jnp.concatenate(self._decision_blocks, axis=1)
        )
        if self.backend == "pallas":
            return self._pallas.chainback(self.code, words, num_data_bits, endstate)
        return cb.chainback(self.code, words, num_data_bits, endstate)

    def path_metric(self, endstate: int = 0) -> jnp.ndarray:
        """Accumulated path error of the survivor at ``endstate`` per frame,
        including everything removed by renormalisation (the quantity ka9q's
        K=15 chainback returns, ref: viterbi615_sse2.cpp:76, :175)."""
        return self.metrics[:, endstate & (self.code.num_states - 1)] + self.renorm_offset


def decode_frames(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    num_data_bits: int,
    backend: str = "jnp",
) -> jnp.ndarray:
    """One-shot functional decode of tail-terminated frames.

    ``symbols``: ``[B, T*R]`` int32 -> decoded bytes ``[B, num_data_bits//8]``.
    """
    B = symbols.shape[0]
    dec = ViterbiDecoder(code, numeric, batch=B, backend=backend)
    dec.update(symbols)
    return dec.chainback(num_data_bits)
