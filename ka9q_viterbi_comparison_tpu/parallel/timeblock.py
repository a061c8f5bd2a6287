"""Time-block (sequence) parallel decoding over a device mesh.

The reference's ``update`` is a strictly sequential O(T) scan over trellis
steps (ref: ka9q_libfec_port/viterbi27_sse2.cpp:123-173) and its only
parallelism is SIMD lanes across states.  This module adds the dimension the
reference doesn't have: a long symbol stream is split into contiguous time
blocks, one per device along the ``time`` mesh axis, and decoded concurrently
using the truncated-Viterbi convergence property -- after ~5K warm-up steps
the survivor metrics (and therefore all subsequent decisions) become
independent of the unknown block-entry state.

Per device (shard_map over the ``time`` axis):

1. halo exchange: receive the last ``overlap`` symbol groups of the left
   neighbour's block and the first ``overlap`` of the right neighbour's
   (``lax.ppermute`` -- rides ICI).
2. warm-up: ACS over the left halo from uniform metrics.  Device 0 instead
   starts from the known-start-state bias (the semantics of
   init_viterbi27_sse2, ref: viterbi27_sse2.cpp:42-53).
3. main ACS over core + right halo, recording decisions.
4. truncated traceback: from the best end state after the right halo
   (last device: from state 0 at its true frame end -- the trellis is
   tail-terminated, ref: src/util.h:51-58 -- with forced-zero halo decisions
   so the walk idles at state 0 through the pad).
5. emit the core block's decoded bits; the first ``overlap`` traced steps
   (the right halo) are discarded as unconverged.

With a noiseless channel and ``overlap`` >= ~5-8 K, output is bit-identical
to the sequential decode; tests assert this against the single-device path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..configs import CodeSpec, NumericSpec
from ..ops import acs
from ..ops.branch import branch_penalties
from ..utils.bits import bits_to_bytes

__all__ = ["default_overlap", "time_block_decode_bits", "time_block_decode"]


def default_overlap(code: CodeSpec) -> int:
    """Truncated-traceback convergence depth: ~8x constraint length."""
    return 8 * code.K


def _uniform_metrics(code: CodeSpec, batch: int) -> jnp.ndarray:
    return jnp.zeros((batch, code.num_states), dtype=jnp.int32)


def _scan_block(code, numeric, metrics, symbols, record: bool):
    """ACS over ``symbols [B, n, R]`` from ``metrics``; optionally record
    packed decision words ``[B, n, W]``."""
    if record:
        m, words, _ = acs.acs_update(code, numeric, metrics, symbols, code.K > 15)
        return m, words
    pens = branch_penalties(code, numeric, symbols)

    def body(m, pen):
        new, _ = acs.acs_step(m, pen)
        return new, None

    m, _ = jax.lax.scan(body, metrics, pens.transpose(1, 0, 2, 3))
    return m, None


def _traceback_bits(code, words, endstate):
    """Reverse decision walk emitting one bit per step (``[B, n]`` uint8)."""
    K = code.K

    def body(state, words_t):
        idx = state >> 5
        W = words_t.shape[-1]
        if W == 1:
            word = words_t[..., 0]
        else:
            word = jnp.take_along_axis(words_t, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
        k = (word >> (state & 31).astype(jnp.uint32)).astype(jnp.int32) & 1
        new_state = (state >> 1) | (k << (K - 2))
        return new_state, k.astype(jnp.uint8)

    _, ks = jax.lax.scan(body, endstate, words.transpose(1, 0, 2), reverse=True)
    return ks.transpose(1, 0)


def time_block_decode_bits(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    mesh: Mesh,
    overlap: int | None = None,
    time_axis: str = "time",
    frame_axis: str | None = "frame",
) -> jnp.ndarray:
    """Decode ``symbols [B, T, R]`` with T split over ``mesh[time_axis]``
    (and the batch optionally split over ``frame_axis``).

    Returns raw trellis bits ``[B, T]`` uint8 (bit t = data bit ``t - K + 1``;
    callers slice off the first K-1 and the tail like the single-device
    chainback does).
    """
    if overlap is None:
        overlap = default_overlap(code)
    n_time = mesh.shape[time_axis]
    B, T, R = symbols.shape
    if T % n_time != 0:
        raise ValueError(f"T={T} not divisible by time axis size {n_time}")
    OL = overlap
    if T // n_time <= OL:
        raise ValueError(f"block size {T // n_time} must exceed overlap {OL}")

    fspec = frame_axis if (frame_axis and frame_axis in mesh.shape) else None
    in_spec = P(fspec, time_axis, None)
    out_spec = P(fspec, time_axis)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec
    )
    def block_fn(sym_blk):  # [b, Tb, R] local
        n = n_time
        idx = jax.lax.axis_index(time_axis)
        fwd = [(i, i + 1) for i in range(n - 1)]
        bwd = [(i + 1, i) for i in range(n - 1)]
        # Left halo = left neighbour's last OL groups; right halo = right
        # neighbour's first OL groups (edges receive zeros, unused).
        left = jax.lax.ppermute(sym_blk[:, -OL:], time_axis, fwd)
        right = jax.lax.ppermute(sym_blk[:, :OL], time_axis, bwd)

        b = sym_blk.shape[0]
        # Warm-up: uniform metrics through the left halo; device 0 uses the
        # known-start bias instead of (its meaningless) warm-up result.
        # (pvary: mark the constant initial carry as device-varying so the
        # scan carry types agree under shard_map's varying-axis tracking.)
        axes = (time_axis,) + ((fspec,) if fspec else ())
        m_init = jax.lax.pcast(_uniform_metrics(code, b), axes, to="varying")
        m_warm, _ = _scan_block(code, numeric, m_init, left, record=False)
        m0 = jnp.where(
            (idx == 0),
            acs.init_metrics(code, numeric, b),
            m_warm,
        )
        # Main scan: core + right halo, decisions recorded.
        main = jnp.concatenate([sym_blk, right], axis=1)  # [b, Tb+OL, R]
        m_end, words = _scan_block(code, numeric, m0, main, record=True)

        is_last = idx == n - 1
        # Last device: its true end is at Tb (tail-terminated, state 0).  Zero
        # its halo decisions so the traceback idles at state 0 through the pad
        # (state 0 + decision 0 -> state 0).
        Tb = sym_blk.shape[1]
        t_ids = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
        words = jnp.where(is_last & (t_ids >= Tb), jnp.uint32(0), words)
        best = jnp.argmin(m_end, axis=-1).astype(jnp.int32)
        end = jnp.where(is_last, jnp.zeros_like(best), best)

        bits_ext = _traceback_bits(code, words, end)  # [b, Tb+OL]
        return bits_ext[:, :Tb]

    return block_fn(symbols)


def time_block_decode(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    num_data_bits: int,
    mesh: Mesh,
    overlap: int | None = None,
    time_axis: str = "time",
    frame_axis: str | None = "frame",
) -> jnp.ndarray:
    """Sharded decode to bytes ``[B, num_data_bits // 8]`` uint8."""
    bits = time_block_decode_bits(
        code, numeric, symbols, mesh, overlap, time_axis, frame_axis
    )
    return bits_to_bytes(bits[:, code.K - 1 : code.K - 1 + num_data_bits])
