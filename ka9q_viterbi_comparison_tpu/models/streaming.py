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

On TPU (``backend="auto"``) each push runs as ONE jitted program per
static shape signature: the Pallas dispatch update (including the
in-place rotating-address kernel, its rotation phases kept globally
consistent across pushes via the blockwise ``t0``), the history append,
and the release walk through the Pallas traceback kernel over the
retained window (``chainback_inplace`` gained a window-phase ``t0`` for
mid-stream starts).  Measured on v5e at K=7 B=512, 2046-step pushes
(``tools/streaming_probe.py``): 8.7 Gsym/s device-side steady state —
1.4x the batch-mode published update rate (the batch bench pays
per-iteration framing the stream amortises; the isolated in-place kernel
measures 9.2 G) — and ~1 Gsym/s driven interactively through this dev
rig's ~15 ms per-dispatch tunnel RTT.  Push sizes that are multiples of
K-1 reuse a single compiled steady-state program.
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
        self._push_cache: dict = {}
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
            # decision-history packing format: the in-place kernel route
            # position-packs words (rotr(s, (t+1) mod (K-1))); a restore
            # onto a decoder whose route packs differently would silently
            # mis-decode the restored window, so it is refused instead.
            "rotated_history": self._rotated,
        }

    def restore(self, state: dict[str, Any]) -> None:
        rot = bool(state.get("rotated_history", False))
        if rot != self._rotated:
            raise ValueError(
                "checkpoint decision-history packing "
                f"({'position' if rot else 'state'}-ordered) does not match "
                "this decoder's route; restore on a decoder with the same "
                "backend routing (same platform/batch/KA9Q_TPU_INPLACE)")
        self.metrics = state["metrics"]
        self.history = state["history"]
        self.steps_emitted = int(state["steps_emitted"])
        self.abs_step = int(state["abs_step"])

    def push(self, symbols: jnp.ndarray) -> jnp.ndarray:
        """Consume symbols, return newly released data bits ``[B, m]``.

        The whole push -- kernel update, history append, bounded release
        walk, window trim -- runs as ONE jitted program per static shape
        signature (push size, retained length, emit count, rotation
        phases): a steady stream reuses a single compiled program per
        push, so per-push cost is one dispatch, not thousands of eager
        ops (measured 40x on the tunneled dev rig)."""
        if symbols.ndim == 2:
            symbols = symbols.reshape(self.batch, -1, self.code.R)
        symbols = symbols.astype(jnp.int32)
        n = symbols.shape[1]
        h = self.history.shape[1]
        nrot = self.code.K - 1
        emit = max(0, (self.abs_step + n - self.traceback_depth)
                   - self.steps_emitted)
        skip = 0
        if emit:
            skip = min(emit, max(0, (self.code.K - 1) - self.steps_emitted))
        if self._rotated:
            # rotation phases are real static parameters of the program
            key = (n, h, emit, self.abs_step % nrot,
                   self.steps_emitted % nrot, skip)
        else:
            # phases are ignored by the non-rotated update and walk; fold
            # them so every phase shares one compilation per shape
            key = (n, h, emit, 0, 0, skip)
        fn = self._push_cache.get(key)
        if fn is None:
            fn = self._push_cache[key] = self._build_push(*key)
        self.metrics, self.history, out = fn(
            self.metrics, self.history, symbols)
        self.abs_step += n
        self.steps_emitted += emit
        return out

    def _build_push(self, n, h, emit, phase, t_off, skip):
        code, numeric = self.code, self.numeric
        disp, rotated = self._dispatch, self._rotated

        @jax.jit
        def f(metrics, history, symbols):
            if disp is not None:
                # only t0 mod (K-1) affects rotation phases / packing
                m, words, _ = disp.acs_update(
                    code, numeric, metrics, symbols, t0=phase)
            else:
                m, words, _ = acs.acs_update(
                    code, numeric, metrics, symbols, True)
            hist = jnp.concatenate([history, words], axis=1)
            if emit <= 0:
                return m, hist, jnp.zeros((metrics.shape[0], 0), jnp.uint8)
            end = jnp.argmin(m, axis=-1).astype(jnp.int32)
            if rotated and disp is not None:
                # Pallas traceback over the position-packed window: the
                # jnp scan walk costs ~6 vector-op dispatches per trellis
                # step (~13 ms per steady push at K=7 B=512); the kernel
                # walks the whole window VMEM-resident.  t0 aligns the
                # kernel's rotation phases with the window start.
                from ..ops.pallas import inplace

                B = metrics.shape[0]
                Bp = disp._pad_batch(B)
                Tw = hist.shape[1]
                Tp = -(-Tw // inplace.CB_TB) * inplace.CB_TB
                w = jnp.pad(hist, ((0, Bp - B), (0, Tp - Tw), (0, 0)))
                end_p = jnp.pad(end, (0, Bp - B))[None, :]
                bits_words = inplace.chainback_inplace(
                    code, w.transpose(1, 2, 0), end_p, Tw,
                    not disp.on_tpu(), t_off)
                raw = disp.unpack_bit_words(bits_words, Tw)[:B]
            else:
                raw = _raw_walk(code, hist, end, rotated, t_off)
            return m, hist[:, emit:], raw[:, skip:emit]

        return f

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
              rotated: bool = False, t_offset: int = 0,
              unroll: int = 8) -> jnp.ndarray:
    """Reverse decision walk over ``[B, n, W]`` from ``end``; returns the
    full output sequence ``[B, n]`` uint8 (no slicing).

    ``rotated``: the words are position-packed by the in-place kernel
    route (decision of state ``s`` at absolute step ``t`` at bit position
    ``rotr(s, (t+1) mod (K-1))`` -- ops/chainback.py contract);
    ``t_offset`` is the absolute trellis step of ``words[:, 0]``.

    ``unroll`` steps run inside each scan iteration: the body is a
    handful of [B]-vector ops, so at unroll=1 the scan's per-iteration
    overhead dominates (measured ~6.7 us/step on the dev rig = the whole
    steady-state streaming cost).  Front-padding keeps any length: the
    walk continues harmlessly past t=0 into the pad (those outputs are
    sliced off; only the decoded bit stream is consumed by callers).
    """
    nrot = code.K - 1
    mask = jnp.int32(code.num_states - 1)
    B, n, W = words.shape

    def step(state, t, words_t):
        if rotated:
            rho = (t + 1) % nrot
            pos = ((state >> rho) | (state << (nrot - rho))) & mask
        else:
            pos = state
        idx = pos >> 5
        if W == 1:
            word = words_t[..., 0]
        else:
            word = jnp.take_along_axis(
                words_t, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
        k = (word >> (pos & 31).astype(jnp.uint32)).astype(jnp.int32) & 1
        return (state >> 1) | (k << (code.K - 2)), k.astype(jnp.uint8)

    pad = (-n) % unroll
    if pad:
        words = jnp.concatenate(
            [jnp.zeros((B, pad, W), words.dtype), words], axis=1)
    nt = n + pad
    wr = words.transpose(1, 0, 2).reshape(nt // unroll, unroll, B, W)
    ts = jnp.arange(t_offset - pad, t_offset + n,
                    dtype=jnp.int32).reshape(nt // unroll, unroll)

    def body(state, xs):
        tc, wc = xs
        ks = [None] * unroll
        for j in range(unroll - 1, -1, -1):
            state, ks[j] = step(state, tc[j], wc[j])
        return state, jnp.stack(ks)

    _, ks = jax.lax.scan(body, end, (ts, wr), reverse=True)
    return ks.reshape(nt, B).transpose(1, 0)[:, pad:]
