"""Streaming (continuous) decoding with bounded latency and checkpoint/resume.

The reference's decoders are already resumable in blocks -- ``update`` can be
called repeatedly and the complete decoder state is (path metrics, decision
history) (ref: viterbi27_sse2.cpp:119-174; SURVEY §5 "checkpoint/resume") --
but the harness only ever decodes whole tail-terminated frames.  This module
adds the production shape of that capability: an unbounded symbol stream
decoded with a sliding decision window, emitting bits with fixed latency via
truncated traceback (survivor paths merge within ~5-8 K steps, the same
convergence property the time-block parallel decoder uses).

State is a pytree of device arrays, so ``checkpoint()`` / ``restore()`` are
trivially serialisable (e.g. with orbax) and a restored decoder continues
bit-identically -- the multi-host failure-recovery story for long streams.

On TPU the per-push symbol update runs through the Pallas dispatch
(``backend="auto"``), including the in-place rotating-address kernel with
its position-packed decision words (rotation phases stay globally
consistent across pushes via the blockwise ``t0``); the release walk is
the jnp scan, bounded to the retained window (``traceback_depth`` + the
emitted span), which for K<=9 (one decision word) is a few vector ops per
step.  Measured streaming throughput: ``tools/streaming_probe.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..configs import CodeSpec, NumericSpec
from ..ops import acs

__all__ = ["StreamingDecoder"]


@dataclasses.dataclass
class StreamingDecoder:
    """Continuous batched Viterbi decoder.

    ``push(symbols)`` consumes ``[B, n*R]`` soft symbols and returns the data
    bits (``[B, m]`` uint8, possibly m=0) that became decodable: everything
    older than ``traceback_depth`` trellis steps behind the stream head.
    ``flush(endstate)`` drains the tail (e.g. at end of a tail-terminated
    stream, endstate=0).
    """

    code: CodeSpec
    numeric: NumericSpec
    batch: int
    traceback_depth: int = 0  # 0 -> default 8*K
    backend: str = "auto"     # "auto" -> pallas dispatch on TPU, else jnp

    def __post_init__(self) -> None:
        if self.traceback_depth <= 0:
            self.traceback_depth = 8 * self.code.K
        if self.backend not in ("auto", "jnp", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        self._dispatch = None
        self._rotated = False
        if self.backend != "jnp":
            from ..ops.pallas import dispatch as pallas_dispatch

            if self.backend == "pallas" or pallas_dispatch.on_tpu():
                # Blockwise kernel updates (t0 keeps the in-place kernel's
                # rotation phases and decision positions globally
                # consistent across pushes -- VERDICT r4 item 5; ref
                # blockwise contract: viterbi27_sse2.cpp:119).
                self._dispatch = pallas_dispatch
                self._rotated = pallas_dispatch.use_inplace(
                    self.code, pallas_dispatch._pad_batch(self.batch))
        self.reset()

    def reset(self, starting_state: int = 0) -> None:
        self.metrics = acs.init_metrics(self.code, self.numeric, self.batch, starting_state)
        W = self.code.decision_words
        self.history = jnp.zeros((self.batch, 0, W), dtype=jnp.uint32)
        self.steps_emitted = 0  # trellis steps already released as bits
        self.abs_step = 0       # stream head (total steps consumed)

    # -- state as a pytree (checkpoint/resume) --
    def checkpoint(self) -> dict[str, Any]:
        return {
            "metrics": self.metrics,
            "history": self.history,
            "steps_emitted": self.steps_emitted,
            "abs_step": self.abs_step,
        }

    def restore(self, state: dict[str, Any]) -> None:
        self.metrics = state["metrics"]
        self.history = state["history"]
        self.steps_emitted = int(state["steps_emitted"])
        self.abs_step = int(state["abs_step"])

    def _emittable(self) -> int:
        """Steps old enough that every survivor agrees on them."""
        return max(0, (self.abs_step - self.traceback_depth) - self.steps_emitted)

    def push(self, symbols: jnp.ndarray) -> jnp.ndarray:
        """Consume symbols, return newly released data bits ``[B, m]``."""
        if symbols.ndim == 2:
            symbols = symbols.reshape(self.batch, -1, self.code.R)
        symbols = symbols.astype(jnp.int32)
        if self._dispatch is not None:
            self.metrics, words, _ = self._dispatch.acs_update(
                self.code, self.numeric, self.metrics, symbols,
                t0=self.abs_step)
        else:
            self.metrics, words, _ = acs.acs_update(
                self.code, self.numeric, self.metrics, symbols, True
            )
        self.history = jnp.concatenate([self.history, words], axis=1)
        self.abs_step += symbols.shape[1]
        return self._release(self._emittable(), endstate=None)

    def flush(self, endstate: int | None = 0) -> jnp.ndarray:
        """Release every remaining step (stream over; default: trellis was
        tail-terminated at state 0)."""
        return self._release(self.abs_step - self.steps_emitted, endstate)

    def _release(self, n_steps: int, endstate) -> jnp.ndarray:
        B = self.batch
        if n_steps <= 0:
            return jnp.zeros((B, 0), dtype=jnp.uint8)
        # Traceback over the whole retained history from the best (or given)
        # end state; only the oldest n_steps outputs are converged/final.
        if endstate is None:
            end = jnp.argmin(self.metrics, axis=-1).astype(jnp.int32)
        else:
            end = jnp.full((B,), endstate & (self.code.num_states - 1), jnp.int32)
        hist = self.history
        raw = _raw_walk(self.code, hist, end, self._rotated,
                        self.steps_emitted)  # [B, len]
        out = raw[:, :n_steps]

        # Drop released steps from history, but always keep the most recent
        # traceback_depth steps for future convergence.
        self.history = hist[:, n_steps:]
        self.steps_emitted += n_steps

        # Walk output at absolute step t is data bit t - (K-1): the first
        # K-1 outputs of the stream are the encoder's warm-up, dropped here.
        start_abs = self.steps_emitted - n_steps  # absolute step of out[:, 0]
        skip = max(0, (self.code.K - 1) - start_abs)
        return out[:, skip:]


def _raw_walk(code: CodeSpec, words: jnp.ndarray, end: jnp.ndarray,
              rotated: bool = False, t_offset: int = 0) -> jnp.ndarray:
    """Reverse decision walk over ``[B, n, W]`` from ``end``; returns the
    full output sequence ``[B, n]`` uint8 (no slicing).

    ``rotated``: the words are position-packed by the in-place kernel
    route (decision of state ``s`` at absolute step ``t`` at bit position
    ``rotr(s, (t+1) mod (K-1))`` -- ops/chainback.py contract);
    ``t_offset`` is the absolute trellis step of ``words[:, 0]``.
    """
    nrot = code.K - 1
    mask = jnp.int32(code.num_states - 1)

    def body(state, xs):
        t, words_t = xs
        if rotated:
            rho = (t + 1) % nrot
            pos = ((state >> rho) | (state << (nrot - rho))) & mask
        else:
            pos = state
        idx = pos >> 5
        W = words_t.shape[-1]
        if W == 1:
            word = words_t[..., 0]
        else:
            word = jnp.take_along_axis(words_t, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
        k = (word >> (pos & 31).astype(jnp.uint32)).astype(jnp.int32) & 1
        return (state >> 1) | (k << (code.K - 2)), k.astype(jnp.uint8)

    n = words.shape[1]
    ts = jnp.arange(t_offset, t_offset + n, dtype=jnp.int32)
    _, ks = jax.lax.scan(body, end, (ts, words.transpose(1, 0, 2)),
                         reverse=True)
    return ks.transpose(1, 0)
