"""Radix-packed traceback: fuse 2^j trellis steps per dependent fetch.

The K=24 traceback is bound by this platform's serialized dependent-fetch
latency (~1.2 us per 4-byte ``dynamic_slice``, one per frame per trellis
step -- measured floor documented in RESULTS.md).  The fetch count, not the
fetch size, is the cost -- so the TPU-native fix is to make each fetch
retire MORE steps: this module repacks the per-step decision bits into
*radix-2^w path fields* -- for every state ``s`` and window of ``w``
consecutive trellis steps, an 8-bit field holding the exact ``w`` decision
bits along the survivor path entered at ``s`` -- so the serial walk does
``~T/w`` dependent fetches instead of ``T``.

The repack is built by a doubling ladder of *streaming selects* (no gathers:
a width-w field's predecessor index ``(s >> w) | (F << (n-w))`` takes only
``2^w`` values of the high bits, so the lookup is a reshape + elementwise
2^w-way select), and it rides the update phase where it is a few percent of
the update's own HBM traffic.  Total field storage equals the packed
decision-bit storage (w bits per state per w steps).

Semantics (matching ``ops.chainback``): at step t with carry state ``s``,
``k = decision_bit(t, s)`` is decoded bit t and the carry becomes
``(s >> 1) | (k << (K-2))`` (ref: viterbi27_sse2.cpp:101-102).  A width-w
field F at anchor t0 satisfies

    state_out = (s >> w) | (F << (n - w)),   n = K - 1
    bit t0+j  = (F >> (w-1-j)) & 1

i.e. F is the w decoded bits of steps [t0, t0+w), earliest step in the MSB
(the bits enter the shift register top-down, latest step deepest).
Composition of two width-w fields (hi = steps [t0+w, t0+2w), lo = [t0,
t0+w)) is ``F2w = (F_lo[pred] << w) | F_hi`` -- pure function composition,
exact for arbitrary decision contents, which makes the whole scheme
bit-exact by construction and testable against the plain walk on random
words.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import CodeSpec
from ..utils.bits import bits_to_bytes

__all__ = ["build_radix_tables", "chainback_radix_bits", "chainback_radix",
           "radix_plan", "MAX_W",
           "build_packed_tables", "chainback_packed_bits",
           "chainback_packed"]

MAX_W = 8  # uint8 fields; w is further capped at n = K-1


def radix_plan(T: int, w: int) -> list[tuple[int, int]]:
    """Segments ``(t0, width)`` covering [0, T), walk (descending-t) order.

    Full w-windows anchored at multiples of w from 0; the remainder above
    them is covered by descending power-of-two widths (each anchored at a
    multiple of its width, which the ladder provides by construction).
    """
    segs: list[tuple[int, int]] = []
    base = (T // w) * w
    t = base
    while t < T:
        # largest power of two that fits in [t, T) with t aligned to it
        width = w
        while width > 1 and (t + width > T or t % width):
            width //= 2
        segs.append((t, width))
        t += width
    segs.reverse()  # walk visits high t first
    for t0 in range(base - w, -1, -w):
        segs.append((t0, w))
    return segs


def _unpack_bits(words: jnp.ndarray, n: int) -> jnp.ndarray:
    """Packed decision words ``[..., W]`` uint32 -> per-state bits
    ``[..., 2^n]`` uint8 (bit of state s at word ``s >> 5``, position
    ``s & 31`` -- the canonical layout of ``ops.chainback``)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (words[..., :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(*words.shape[:-1], -1)[..., : 1 << n].astype(jnp.uint8)


def _combine(lo: jnp.ndarray, hi: jnp.ndarray, w: int, n: int) -> jnp.ndarray:
    """Compose width-w fields into width-2w fields (both ``[..., S]`` uint8).

    ``out[s] = (lo[(s>>w) | (hi[s] << (n-w))] << w) | hi[s]``; the lookup is
    a 2^w-way select over the reshaped slices of ``lo`` (slice c holds the
    states whose top w bits equal c), each upsampled 2^w-fold because
    ``s >> w`` repeats -- reads ``lo`` exactly once, no gather.
    """
    lead = lo.shape[:-1]
    lo_r = lo.reshape(*lead, 1 << w, 1 << (n - w))
    out = None
    for c in range(1 << w):
        cand = jnp.repeat(lo_r[..., c, :], 1 << w, axis=-1)
        out = cand if out is None else jnp.where(hi == c, cand, out)
    return (out << w) | hi


def _pair_level(lower: jnp.ndarray, w: int, n: int) -> jnp.ndarray:
    """[B, nwin, S] width-w fields -> [B, nwin//2, S] width-2w fields.

    Window 2i pairs (lo=window 2i, hi=window 2i+1); mapped over windows to
    bound live memory to O(B*S) per step.
    """
    nw = lower.shape[1] // 2
    lo = lower[:, 0 : 2 * nw : 2]
    hi = lower[:, 1 : 2 * nw : 2]
    pairs = jnp.stack([lo, hi], axis=2)  # [B, nw, 2, S]

    def one(p):
        return _combine(p[:, 0], p[:, 1], w, n)

    return jax.lax.map(one, pairs.transpose(1, 0, 2, 3)).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnums=(0, 2))
def build_radix_tables(code: CodeSpec, words: jnp.ndarray, w: int = MAX_W):
    """Build the radix field tables from decision words ``[B, T, W]``.

    Returns ``{width: [B, nwin(width), S] uint8}`` for widths 2..w (powers
    of two); width-1 lookups read ``words`` directly.  All levels are kept:
    the remainder segments of :func:`radix_plan` fetch from the lower
    levels.  ``w`` must be a power of two and is capped at min(MAX_W, K-1).
    """
    n = code.K - 1
    w = min(w, MAX_W, 1 << (n.bit_length() - 1) if n < MAX_W else MAX_W)
    if w & (w - 1):
        raise ValueError("w must be a power of two")
    B, T, _ = words.shape
    tables: dict[int, jnp.ndarray] = {}
    if w < 2:
        return tables

    # Level 1 -> 2: F_hi = bit(t0+1, s); F_lo = bit(t0, (s>>1)|(F_hi<<n-1)).
    n2 = T // 2
    pairs = words[:, : 2 * n2].reshape(B, n2, 2, -1)

    def level2(p):
        hi = _unpack_bits(p[:, 1], n)
        lo = _unpack_bits(p[:, 0], n)
        return _combine(lo, hi, 1, n)

    cur = jax.lax.map(level2, pairs.transpose(1, 0, 2, 3)).transpose(1, 0, 2)
    tables[2] = cur
    width = 2
    while width < w:
        cur = _pair_level(cur, width, n)
        width *= 2
        tables[width] = cur
    return tables


def chainback_radix_bits(
    code: CodeSpec,
    words: jnp.ndarray,
    tables: dict[int, jnp.ndarray],
    num_data_bits: int,
    endstate: jnp.ndarray | int = 0,
    w: int = MAX_W,
):
    """Traceback using radix fields: ``~T/w`` dependent fetches per frame.

    ``words``: canonical ``[B, T, W]`` decision words (used for width-1
    remainder segments); ``tables``: from :func:`build_radix_tables`.
    Returns ``(bits [B, num_data_bits] uint8, start_state [B] int32)``.
    """
    B, T, _ = words.shape
    n = code.K - 1
    w = min(w, MAX_W, max((k for k in tables), default=1))
    mask = jnp.int32(code.num_states - 1)
    state = list(jnp.broadcast_to(
        jnp.asarray(endstate, dtype=jnp.int32) & mask, (B,)))

    segs = radix_plan(T, w)
    pieces: dict[int, list] = {}
    for t0, width in segs:
        seg_bits = []
        for b in range(B):
            s = state[b]
            if width == 1:
                idx = (s >> 5).astype(jnp.int32)
                word = jax.lax.dynamic_slice(
                    words, (b, t0, idx), (1, 1, 1))[0, 0, 0]
                F = ((word >> (s & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)
            else:
                tab = tables[width]
                F = jax.lax.dynamic_slice(
                    tab, (b, t0 // width, s), (1, 1, 1))[0, 0, 0].astype(jnp.int32)
            state[b] = (s >> width) | (F << (n - width))
            seg_bits.append(F)
        pieces[t0] = (jnp.stack(seg_bits), width)  # [B] fields

    # Assemble bits in natural t order.
    cols = []
    for t0 in sorted(pieces):
        F, width = pieces[t0]
        shifts = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
        cols.append(((F[:, None] >> shifts) & 1).astype(jnp.uint8))
    bits = jnp.concatenate(cols, axis=1)
    start_state = jnp.stack(state)
    return bits[:, code.K - 1 : code.K - 1 + num_data_bits], start_state


def chainback_radix(code, words, tables, num_data_bits, endstate=0, w=MAX_W):
    """Decode to bytes ``[B, num_data_bits // 8]`` uint8 (MSB-first)."""
    bits, _ = chainback_radix_bits(code, words, tables, num_data_bits,
                                   endstate, w)
    return bits_to_bytes(bits)
