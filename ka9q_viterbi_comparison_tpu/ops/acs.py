"""Add-compare-select (ACS) symbol update as a `lax.scan` over the trellis.

This is the framework's portable reference path for the reference's hot loop
#1, the per-bit SSE butterfly sweep (ref: ka9q_libfec_port/viterbi27_sse2.cpp:
119-175).  Design translation:

* SIMD lanes over 16 states        -> whole-state-vector jnp ops ``[B, S]``
                                      with an extra batch axis B of
                                      independent frames on the 128-wide
                                      vector lanes;
* per-bit C `while` loop           -> ``jax.lax.scan`` over the time axis;
* pointer-swapped metric buffers   -> the scan carry;
* `movemask` packed decision words -> uint32 words, bit ``s % 32`` of word
                                      ``s // 32`` = decision for new state s;
* lazy threshold renormalisation   -> unconditional shift-to-zero every
                                      ``renorm_interval`` steps (subtracting a
                                      constant from all metrics preserves every
                                      compare-select decision bit-for-bit).

Butterfly (same pairing as the reference, viterbi27_sse2.cpp:149-166): new
state ``2*s2 + b`` selects the better of predecessor ``s2`` (decision 0) and
``s2 + S/2`` (decision 1).  Ties keep the low predecessor, matching ka9q's
strict ``cmpgt`` select (viterbi27_sse2.cpp:155-156).

Metrics accumulate in int32: branch penalties are at most ``R * span`` per
step so int32 gives >1e6 steps of headroom without renormalisation -- the
narrow-dtype + renorm dance the reference needs for u8/u16 registers is a
performance option here (Pallas kernels), not a correctness requirement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import CodeSpec, NumericSpec
from .branch import branch_penalties, penalty_base_and_coef, transition_tables_jnp

__all__ = ["init_metrics", "acs_update", "acs_step"]


def init_metrics(
    code: CodeSpec,
    numeric: NumericSpec,
    batch: int,
    starting_state: int = 0,
) -> jnp.ndarray:
    """Fresh path metrics ``[B, S]`` int32, biasing the known start state
    (ref: init_viterbi27_sse2, viterbi27_sse2.cpp:42-53)."""
    m = jnp.full((batch, code.num_states), numeric.initial_margin, dtype=jnp.int32)
    return m.at[:, starting_state & (code.num_states - 1)].set(0)


def acs_step(metrics: jnp.ndarray, pen: jnp.ndarray):
    """One trellis step.

    metrics: ``[B, S]`` int32; pen: ``[B, 4, S/2]`` int32 indexed ``h*2 + b``.
    Returns ``(new_metrics [B, S], decisions [B, S] bool)`` where decision bit
    for new state ``2*s2 + b`` is 1 iff the ``s2 + S/2`` predecessor won.
    """
    half = metrics.shape[-1] // 2
    old_lo = metrics[..., :half]
    old_hi = metrics[..., half:]
    cand = []
    decs = []
    for b in (0, 1):
        c_lo = old_lo + pen[..., 0 * 2 + b, :]
        c_hi = old_hi + pen[..., 1 * 2 + b, :]
        d = c_hi < c_lo
        cand.append(jnp.where(d, c_hi, c_lo))
        decs.append(d)
    # Interleave: new[2*s2 + b] = cand[b][s2].
    new = jnp.stack(cand, axis=-1).reshape(*metrics.shape)
    dec = jnp.stack(decs, axis=-1).reshape(*metrics.shape)
    return new, dec


def _pack_decisions(dec: jnp.ndarray) -> jnp.ndarray:
    """bool ``[B, S]`` -> uint32 words ``[B, W]`` (pad to 32 if S < 32)."""
    S = dec.shape[-1]
    if S < 32:
        dec = jnp.pad(dec, [(0, 0)] * (dec.ndim - 1) + [(0, 32 - S)])
        S = 32
    w = dec.reshape(*dec.shape[:-1], S // 32, 32).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return (w * weights).sum(axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def acs_update(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics: jnp.ndarray,
    symbols: jnp.ndarray,
    fused_penalties: bool = False,
):
    """Run the symbol update over a block of symbols.

    Args:
      metrics: ``[B, S]`` int32 carry (from ``init_metrics`` or a previous
        block -- blockwise calls match the reference's resumable ``update``,
        ref: viterbi27_sse2.cpp:119).
      symbols: ``[B, T, R]`` int32 soft symbols.
      fused_penalties: compute branch penalties inside the scan body from the
        transition tables instead of as one whole-frame matmul.  Required for
        K=24 (table too large to materialise over T) and useful to bound
        memory for very long blocks.

    Returns:
      (metrics ``[B, S]`` int32, decision words ``[B, T, W]`` uint32,
       renorm offset ``[B]`` int32 -- total amount subtracted from every
       metric by renormalisation, so ``metrics + offset`` is the true
       accumulated path error as the reference reports it via the returned
       ``path_metric``, ref: viterbi615_sse2.cpp:76, :157-183).
    """
    B, T, R = symbols.shape
    interval = numeric.renorm_interval

    if fused_penalties:
        # uint8 expected-bit tables: 4x less HBM read per step than int32
        # (32 vs 128 MiB at K=24); penalties are built ELEMENTWISE inside
        # the compare-select so XLA fuses them into the butterfly sweep --
        # an einsum/dot forces the [B, 4, S/2] penalty tensor (256 MiB at
        # K=24 B=4) through HBM every step and left the jnp K=24 update 3x
        # slower than the reference's scalar ka9q column (VERDICT r2).
        tables = transition_tables_jnp(code).astype(jnp.uint8)
        half = code.num_states // 2
        # When every polynomial taps both register ends (true for all six
        # standard configs incl. K=24 ICE), flipping (h, b) together flips
        # no expected bit: pen(1,1) = pen(0,0) and pen(0,1) = pen(1,0) --
        # the same factoring the Pallas kernels use (ARCHITECTURE.md).  Two
        # penalty builds instead of four matters here because the scan body
        # is materialized-pass-bound at K=24 ([B, S/2] is 67 MiB per op).
        both_ends = all(
            (p & 1) and (p >> (code.K - 1)) & 1 for p in code.abs_polys())

        def build_pen(base, coef, hb):
            pen = base[:, None]
            for r in range(R):
                pen = pen + coef[:, r, None] * tables[hb, r]
            return pen

        def body(carry, xs):
            m, off = carry
            t, sym = xs
            base, coef = penalty_base_and_coef(numeric, sym)  # [B], [B,R]
            old = (m[..., :half], m[..., half:])
            if both_ends:
                p00 = build_pen(base, coef, 0)
                p10 = build_pen(base, coef, 2)
                pens = {(0, 0): p00, (1, 0): p10, (0, 1): p10, (1, 1): p00}
            else:
                pens = {(h, b): build_pen(base, coef, h * 2 + b)
                        for h in (0, 1) for b in (0, 1)}
            cand, decs = [], []
            for b in (0, 1):
                cs = [old[h] + pens[(h, b)] for h in (0, 1)]
                d = cs[1] < cs[0]
                cand.append(jnp.where(d, cs[1], cs[0]))
                decs.append(d)
            new = jnp.stack(cand, axis=-1).reshape(*m.shape)
            dec = jnp.stack(decs, axis=-1).reshape(*m.shape)
            if interval:
                do_renorm = (t % interval) == (interval - 1)
                shift = jnp.where(do_renorm, new.min(axis=-1), 0)
                new = new - shift[:, None]
                off = off + shift
            return (new, off), _pack_decisions(dec)

        xs = (jnp.arange(T, dtype=jnp.int32), symbols.transpose(1, 0, 2))
    else:
        pens = branch_penalties(code, numeric, symbols)  # [B, T, 4, S/2]

        def body(carry, xs):
            m, off = carry
            t, pen = xs
            new, dec = acs_step(m, pen)
            if interval:
                do_renorm = (t % interval) == (interval - 1)
                shift = jnp.where(do_renorm, new.min(axis=-1), 0)
                new = new - shift[:, None]
                off = off + shift
            return (new, off), _pack_decisions(dec)

        xs = (jnp.arange(T, dtype=jnp.int32), pens.transpose(1, 0, 2, 3))

    offset0 = jnp.zeros((B,), dtype=jnp.int32)
    (metrics, offset), words = jax.lax.scan(body, (metrics, offset0), xs)
    return metrics, words.transpose(1, 0, 2), offset
