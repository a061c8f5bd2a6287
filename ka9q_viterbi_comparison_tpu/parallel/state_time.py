"""Composed state x time mesh decoding for long large-K streams.

``parallel.statewise`` shards the 2^23-state K=24 trellis over the ``state``
mesh axis but its traceback costs one ``psum`` per trellis step -- fine for
the reference's 8-byte ICE frames (T = 87, ref: src/main.cpp:411-414), O(T)
collective latency for long streams.  ``parallel.timeblock`` removes the O(T)
serial dependency by splitting time into truncated-traceback blocks, but its
per-device ACS holds the whole metric vector -- impossible at K=24 (16 MiB of
path metrics plus 1 MiB of decisions per transmitted bit,
ref: viterbi224_sse2.cpp:14-20).

This module composes the two on a 2-D ``(state, time)`` mesh: every time
block runs the state-sharded butterfly-exchange ACS (metrics split over
``state``), and every traceback stays inside one time block (halo-converged,
so blocks never serialize on each other).  Collectives per trellis step are
the same two half-shard ``ppermute`` pairs as pure state sharding, riding
ICI; the ``time`` axis adds only the one-shot symbol halo exchange and the
per-step ``psum`` of the block-local traceback.

The block-entry problem is the standard truncated-Viterbi warm-up
(cf. ``timeblock.py``): each block re-runs ACS over the left neighbour's
last ``overlap`` symbol groups from uniform metrics before its own block, so
its survivor decisions are exact once the true path has merged (~5-8 K
steps on a noiseless channel); block 0 instead starts from the known-start
bias (ref: viterbi27_sse2.cpp:42-53).  Non-final blocks trace from the
globally best end state (min over state shards with first-index tie-break,
matching ``jnp.argmin``); the final block traces from state 0 (the trellis
is tail-terminated, ref: src/util.h:51-58).

K=24 frames always have odd T (8n + 23), so an even time split needs
padding: :func:`pad_to_time_blocks` appends encoded zero-input groups (the
state-0 self-loop's exact rail symbols), under which the tail-terminated
path idles at state 0 and the decoded pad bits are dropped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..configs import CodeSpec, NumericSpec
from ..utils.bits import bits_to_bytes
from .statewise import _sharded_acs_scan, _sharded_traceback
from .timeblock import default_overlap

__all__ = ["pad_to_time_blocks", "state_time_decode", "state_time_decode_bits"]


def pad_to_time_blocks(
    code: CodeSpec, numeric: NumericSpec, symbols: jnp.ndarray, multiple: int
) -> tuple[jnp.ndarray, int]:
    """Pad ``symbols [B, T, R]`` to ``T % multiple == 0`` by appending the
    encoded zero-input symbol groups of the state-0 self-loop.

    After the K-1 zero tail bits the true path sits at state 0
    (ref: src/util.h:51-58); feeding it further zero input keeps it there
    with zero added branch cost, so the decode of the original T steps is
    unchanged and the pad decodes to zero bits (which the caller drops).
    Returns ``(padded_symbols, pad)``.
    """
    B, T, R = symbols.shape
    pad = (-T) % multiple
    if pad == 0:
        return symbols, 0
    # Expected output bit of the 0 -(b=0)-> 0 transition: parity(0 & p) = 0,
    # so only the polynomial inversion flips it (ref: spiral27.cpp:69).
    vals = jnp.asarray(
        [numeric.soft_high if inv else numeric.soft_low
         for inv in code.inversions()],
        dtype=symbols.dtype,
    )
    block = jnp.broadcast_to(vals, (B, pad, R))
    return jnp.concatenate([symbols, block], axis=1), pad


def state_time_decode_bits(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    mesh: Mesh,
    overlap: int | None = None,
    time_axis: str = "time",
    state_axis: str = "state",
) -> jnp.ndarray:
    """Decode ``[B, T, R]`` frames on a composed ``(state, time)`` mesh.

    The state axis shards the trellis metric vector (butterfly half-shard
    exchange per step); the time axis shards the symbol stream into
    truncated-traceback blocks with ``overlap`` warm-up steps.  Returns
    trellis bits ``[B, T]`` uint8 (callers slice off the first K-1 like the
    single-device chainback does).

    Requires ``T % mesh.shape[time_axis] == 0`` (see
    :func:`pad_to_time_blocks`) and a block size exceeding ``overlap``.
    """
    if overlap is None:
        overlap = default_overlap(code)
    n_time = mesh.shape[time_axis]
    n_state = mesh.shape[state_axis]
    S = code.num_states
    if S % (2 * n_state) != 0 or (n_state % 2 != 0 and n_state != 1):
        raise ValueError(f"state axis size {n_state} incompatible with S={S}")
    B, T, R = symbols.shape
    if T % n_time != 0:
        raise ValueError(
            f"T={T} not divisible by time axis size {n_time}; "
            "pad with pad_to_time_blocks")
    Tb = T // n_time
    OL = overlap
    if Tb <= OL:
        raise ValueError(f"block size {Tb} must exceed overlap {OL}")
    chunk = S // (2 * n_state)
    n_local = S // n_state
    K = code.K

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, time_axis, None),),
        out_specs=P(None, time_axis),
    )
    def run(sym_blk):  # [B, Tb, R]: time-sharded, state-replicated
        t_idx = jax.lax.axis_index(time_axis)
        d = jax.lax.axis_index(state_axis)
        base = d * n_local
        s2_block = (jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
                    + base // 2)

        # Symbol halo exchange along time (edges receive zeros, unused).
        fwd = [(i, i + 1) for i in range(n_time - 1)]
        bwd = [(i + 1, i) for i in range(n_time - 1)]
        left = jax.lax.ppermute(sym_blk[:, -OL:], time_axis, fwd)
        right = jax.lax.ppermute(sym_blk[:, :OL], time_axis, bwd)

        b = sym_blk.shape[0]
        axes = (time_axis, state_axis)
        # Warm-up: uniform metrics through the left halo (device-varying so
        # the scan carry agrees under shard_map's varying-axis tracking).
        m_unif = jax.lax.pcast(
            jnp.zeros((b, n_local), dtype=jnp.int32), axes, to="varying")
        m_warm, _ = _sharded_acs_scan(
            code, numeric, m_unif, left, state_axis, n_state, s2_block, False)

        # Block 0 replaces its (meaningless) warm-up with the known-start
        # bias: global state 0 lives at local index 0 of state-device 0.
        m_bias = jnp.full((b, n_local), numeric.initial_margin, dtype=jnp.int32)
        m_bias = m_bias.at[:, 0].add(
            -numeric.initial_margin * (d == 0).astype(jnp.int32))
        # (m_bias already varies over `state` through d; lift `time` only.)
        m0 = jnp.where(t_idx == 0,
                       jax.lax.pcast(m_bias, time_axis, to="varying"), m_warm)

        # Main scan: core + right halo, decisions recorded.
        main = jnp.concatenate([sym_blk, right], axis=1)  # [b, Tb+OL, R]
        m_end, dec_local = _sharded_acs_scan(
            code, numeric, m0, main, state_axis, n_state, s2_block, True)

        is_last = t_idx == n_time - 1
        # Last block: true end at Tb, state 0 (tail-terminated); zero its
        # halo decisions so the walk idles at state 0 through the pad.
        t_ids = jax.lax.broadcasted_iota(jnp.int32, dec_local.shape, 0)
        dec_local = jnp.where(is_last & (t_ids >= Tb), False, dec_local)

        # Global best end state over state shards, first-index tie-break
        # (matches jnp.argmin over the unsharded vector).
        local_min = m_end.min(axis=-1)
        g_min = jax.lax.pmin(local_min, state_axis)
        local_arg = jnp.argmin(m_end, axis=-1).astype(jnp.int32) + base
        cand = jnp.where(local_min == g_min, local_arg, S)
        best = jax.lax.pmin(cand, state_axis)
        end = jnp.where(is_last, jnp.zeros_like(best), best)

        bits_ext = _sharded_traceback(code, dec_local, end, base, state_axis)
        return bits_ext[:, :Tb]

    return run(symbols)


def state_time_decode(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    num_data_bits: int,
    mesh: Mesh,
    overlap: int | None = None,
    time_axis: str = "time",
    state_axis: str = "state",
) -> jnp.ndarray:
    """Composed-mesh decode to bytes ``[B, num_data_bits // 8]`` uint8.

    ``symbols`` is padded to the time-axis multiple internally (the pad
    decodes to dropped bits, see :func:`pad_to_time_blocks`).
    """
    n_time = mesh.shape[time_axis]
    symbols, _ = pad_to_time_blocks(code, numeric, symbols, n_time)
    bits = state_time_decode_bits(
        code, numeric, symbols, mesh, overlap, time_axis, state_axis)
    return bits_to_bytes(bits[:, code.K - 1 : code.K - 1 + num_data_bits])
