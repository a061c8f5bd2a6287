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
from .branch import (
    branch_penalties,
    penalty_base_and_coef,
    rotating_tables_jnp,
    transition_tables_jnp,
)

__all__ = ["init_metrics", "acs_update", "acs_update_rotating", "acs_step"]


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


def _rot_layout(m: jnp.ndarray, r: int, nbits: int) -> jnp.ndarray:
    """Bit-rotation relayout along the last axis: ``out[..., p] = m[...,
    rotl(p, r)]`` over ``nbits``-bit indices.

    A rotation permutation factors into one reshape + transpose + reshape
    (block granularity ``2**r``), which XLA lowers as a single relayout copy
    -- no gather, no embedded index literal (the K=24 axis is 2^23 long).
    """
    r %= nbits
    if r == 0:
        return m
    lead = m.shape[:-1]
    S = m.shape[-1]
    return m.reshape(*lead, S >> r, 1 << r).swapaxes(-1, -2).reshape(*lead, S)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def acs_update_rotating(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics: jnp.ndarray,
    symbols: jnp.ndarray,
    t0: int = 0,
):
    """Symbol update via in-place rotating state addressing, in pure jnp.

    Same contract as ``acs_update`` (metrics in/out in natural state order),
    but decision words come back packed in *position* order -- bit
    ``rotr(s, (t+1) mod (K-1))`` of step ``t``'s words is the decision for
    new state ``s`` (``chainback_bits(..., rotated=True)`` consumes them).

    Motivation: the natural-order scan body interleaves the full ``[B, S]``
    metric tensor at element granularity every step (``stack(...,-1).reshape``)
    -- at K=24 that relayout is the dominant cost of the portable path and
    XLA cannot fuse across it.  Under the FFT-style address rotation the
    butterfly is in-place (ref analogue: the register ping-pong of the
    reference's SPIRAL kernels, spiral/spiral27.cpp:130-381, generalised to
    the K-1-cycle the Pallas ``inplace`` kernel uses): each step is a pure
    elementwise compare-select between two halves of the position axis at
    stride ``2**j``, so the interleave happens at block granularity ``2**j``
    (a cheap copy for 22 of the 23 K=24 phases) instead of stride 1 every
    step.

    ``t0``: trellis steps consumed before this call (blockwise resume);
    static, only ``t0 mod (K-1)`` matters -- callers should pass it reduced
    to bound recompilation.  When ``numeric.renorm_interval`` is set, the
    renorm schedule is based on the step index within the call; that shifts
    *when* renorms happen across blocks but never the decisions or the
    returned (metrics + offset) sum.

    ROUTING OUTCOME (v5e, tools/k24_rot_probe.py): NOT routed for K=24 --
    at the benchmark batch B=4 XLA's compile hits a permanent HBM OOM
    (program 16.35 G > 15.75 G chip: the per-phase permutation temps of the
    128 MiB metric tensor stay live across the 23-phase cycle), and B=1
    does not finish compiling in 20 minutes.  Kept as a correctness-tested
    formulation reference for the in-place Pallas kernel (which applies the
    same rotation where it pays: VMEM-resident K <= 15).
    """
    B, T, R = symbols.shape
    K = code.K
    nrot = K - 1
    S = code.num_states
    interval = numeric.renorm_interval
    t0 = t0 % nrot
    both_ends = all(
        (p & 1) and (p >> (code.K - 1)) & 1 for p in code.abs_polys())
    classes = (0, 2) if both_ends else (0, 1, 2, 3)

    C = T // nrot  # full rotation cycles handled by the scan
    rem = T - C * nrot
    n_tabs = nrot if C else rem
    tabs = [rotating_tables_jnp(code, (t0 + u) % nrot, classes)
            for u in range(n_tabs)]

    def step(m, off, sym, u, t):
        """One trellis step at rotation phase (t0 + u) % nrot."""
        phase = (t0 + u) % nrot
        j = (K - 2 - phase) % nrot
        stride = 1 << j
        G = S >> (j + 1)
        base, coef = penalty_base_and_coef(numeric, sym)  # [B], [B, R]
        x = m.reshape(B, G, 2, stride)
        lo, hi = x[:, :, 0], x[:, :, 1]  # [B, G, stride]
        tb = tabs[u].reshape(len(classes), R, G, stride)

        def pen(ci):
            p = base[:, None, None]
            for r in range(R):
                p = p + coef[:, r, None, None] * tb[ci, r]
            return p

        p00, p10 = pen(0), pen(1 if both_ends else 2)
        p01, p11 = (p10, p00) if both_ends else (pen(1), pen(3))
        c00, c10 = lo + p00, hi + p10
        d0 = c10 < c00
        n0 = jnp.where(d0, c10, c00)
        c01, c11 = lo + p01, hi + p11
        d1 = c11 < c01
        n1 = jnp.where(d1, c11, c01)
        new = jnp.stack([n0, n1], axis=2).reshape(B, S)
        dec = jnp.stack([d0, d1], axis=2).reshape(B, S)
        if interval:
            do_renorm = (t % interval) == (interval - 1)
            shift = jnp.where(do_renorm, new.min(axis=-1), 0)
            new = new - shift[:, None]
            off = off + shift
        return new, off, _pack_decisions(dec)

    m = _rot_layout(metrics, t0, nrot)  # natural order == phase-0 positions
    off = jnp.zeros((B,), dtype=jnp.int32)
    word_blocks = []
    if C:
        sym_c = symbols[:, : C * nrot].reshape(B, C, nrot, R).transpose(1, 2, 0, 3)

        def cycle(carry, xs):
            m, off = carry
            syms, c = xs  # [nrot, B, R], scalar cycle index
            ws = []
            for u in range(nrot):
                m, off, w = step(m, off, syms[u], u, c * nrot + u)
                ws.append(w)
            return (m, off), jnp.stack(ws)  # [nrot, B, W]

        (m, off), words = jax.lax.scan(
            cycle, (m, off), (sym_c, jnp.arange(C, dtype=jnp.int32)))
        word_blocks.append(words.reshape(C * nrot, B, -1))
    for u in range(rem):
        m, off, w = step(m, off, symbols[:, C * nrot + u].astype(jnp.int32),
                         u, jnp.int32(C * nrot + u))
        word_blocks.append(w[None])
    words = (word_blocks[0] if len(word_blocks) == 1
             else jnp.concatenate(word_blocks, axis=0))
    m = _rot_layout(m, (nrot - (t0 + T) % nrot) % nrot, nrot)
    return m, words.transpose(1, 0, 2), off
