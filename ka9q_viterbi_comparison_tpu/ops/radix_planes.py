"""Bit-plane radix traceback: one dependent fetch per W_WALK trellis steps.

The K=24 traceback is bound by serialized dependent-fetch latency (~1.2 us
per fetch, one per frame per trellis step -- RESULTS.md), so the fix is to
retire more steps per fetch.  ``ops.radix`` (round 2, since removed) proved
the walk side with width-8 path fields but its uint8 per-state tables made
the repack XLA-relayout bound (~30x the update kernel's own time).  This
module is the production design; it removes the repack bottleneck with
three structural moves:

1. **Telescoping fields.**  The width-8 field at state ``s`` for window
   ``[t0, t0+8)`` decomposes as

       F_8(s) = G_8(s)<<4 | G_4(s)<<2 | G_2(s)<<1 | D(t0+7, s)

   where each ``G_{2v}(s) = F_v^{lo}[pred_v(s)]`` is only the *newly
   prepended* half, gathered from the earlier (lo) sub-window at the
   predecessor the later (hi) half walks to; the hi half contributes its own
   field *at the same state* ``s``.  Total table storage is the packed
   decision-bit storage again (1+1+2+4 bits per state per 8 steps), and
   every level is consumed at one common index.

2. **Residue-sliced bit-plane combines.**  G-levels live as canonical packed
   bit planes (bit ``s & 31`` of word ``s >> 5`` -- the decision-word
   layout).  The gather ``lo[(s>>v) | (F<<(n-v))]`` is then word-parallel:
   the source bits of output word k under candidate ``F = c`` are simply
   bits ``[k*nb, (k+1)*nb)`` of candidate c's plane region (``nb = 32>>v``
   -- the ``s >> v`` map is a plain bitstream downsample), so slicing the
   output by word residue ``r = k mod 2^v`` makes the whole combine
   full-lane elementwise: ``out_r[q] = spread((lo_c[q] >> r*nb) & nbmask)``
   selected by AND-masks of the hi window's planes.  One minor-axis
   transpose per plane replaces the per-candidate lane shuffles that made
   the uint8 repack 128/2^v-fold lane-wasteful.

3. **Time-major single-fetch windows at a data-aligned anchor.**  All plane
   arrays are TIME-MAJOR (``[T, B, W]`` -- the update scan's native output
   order), so every window selection is a cheap leading-axis slice and the
   producer never pays a batch-major transpose of the 348 MiB K=24 word
   tensor.  The field bits of every full window are nibble-packed (width 4;
   byte-packed at width 8) per state into one uint32 table so the walk
   issues ONE single-word fetch per window per frame, and windows are
   anchored at ``t = anchor (mod width)`` with ``anchor = K-1`` for frame
   decodes: the walk stops at the first kept data bit, which for the
   reference's 8-byte K=24 frames (T = 87, ref: src/main.cpp:411-414) means
   exactly 16 (or 8) fetch rounds and no remainder segments at all.

Measured on v5e at K=24 bench shapes (B=4, T=87; tools/k24_plane_probe.py,
tools/repack_marginal.py): width-4 repack 49 ms marginal riding a ~148 ms
update (update+repack 3.24 ksym/s vs the reference's best 2.82 k), walk
7.6 Mbit/s aggregate vs the reference's 3.41-3.68 M chainback and 0.30 M
for the plain per-step walk here.  Width 8 doubles the walk (17 Mbit/s)
but its 16-candidate v=4 combine more than doubles the repack (117 ms),
dropping update+repack below the reference -- so 4 is the default.

Semantics match ``ops.chainback`` exactly (decision bit k at step t, state s
=> decoded bit t = k, next state ``(s>>1) | (k << (K-2))``, ref:
ka9q_libfec_port/viterbi27_sse2.cpp:101-102); the composition is pure
function composition over arbitrary decision words, so bit-exactness is
testable on random words.  The reference's own K=24 chainback is the
bit-serial walk at viterbi224_sse2.cpp:93-105.

Requires ``K - 1 >= 9`` (every combine reads whole-word source runs,
``W >= 2^v``); smaller trellises use the Pallas traceback kernels instead.

Round 5: the routed K=24 path no longer builds these tables in XLA at all
-- the depth-4 update kernel propagates the survivor-path fields in-kernel
and emits the nibble-packed ``f4`` (or byte-packed ``f8``) table directly
(``ops.pallas.large_k4``; ``KA9Q_TPU_K24_FIELDS`` / ``KA9Q_TPU_K24_WALK``).
This builder remains the portable construction (any decision words, any
anchor) and the oracle the kernel emission is tested against
(bit-identical tables, ``tests/test_radix_planes.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import CodeSpec
from ..utils.bits import bits_to_bytes

__all__ = ["build_plane_tables", "chainback_plane_bits", "chainback_planes",
           "plane_plan", "MIN_N", "W_WALK"]

MIN_N = 9   # minimum K-1: the v=4 combine reads 2-bit runs from W>=16 words

# Steps retired per dependent fetch.  4 is the measured sweet spot on v5e
# (tools/repack_marginal.py + tools/k24_plane_probe.py): the width-8 table
# needs the 16-candidate v=4 combine, ~70 ms of repack riding the update
# phase for a 2x walk speedup the chainback doesn't need (walk fetches
# pipeline across frames at ~0.5 us each); width-4's repack is ~4x cheaper
# and its walk still beats the reference's chainback >2x.  Width 8 remains
# available (build with ``max_width=8``).
W_WALK = 4


def plane_plan(T: int, anchor: int, max_width: int = W_WALK) -> list[tuple[int, int]]:
    """Segments ``(t0, width)`` covering [anchor, T), walk (descending-t)
    order.  Full ``max_width``-windows at ``t0 = anchor (mod max_width)``;
    the remainder below T is covered by descending power-of-two widths, each
    ending on a multiple of its width (relative to anchor) so its tables
    exist."""
    segs: list[tuple[int, int]] = []
    t = T
    while t > anchor:
        width = max_width
        while width > 1 and (t - width < anchor or (t - anchor) % width):
            width //= 2
        segs.append((t - width, width))
        t -= width
    return segs


def _u32(x: int) -> jnp.ndarray:
    return jnp.uint32(x)


def _spread(x: jnp.ndarray, v: int) -> jnp.ndarray:
    """Repeat each of the low ``32 >> v`` bits of ``x`` ``2^v`` times
    (aligns source-bit runs at ``s >> v`` granularity to output lanes).
    Zero-interleave stages then fills; all uint32 elementwise."""
    if v == 1:  # 16 bits -> each x2
        x = (x | (x << 8)) & _u32(0x00FF00FF)
        x = (x | (x << 4)) & _u32(0x0F0F0F0F)
        x = (x | (x << 2)) & _u32(0x33333333)
        x = (x | (x << 1)) & _u32(0x55555555)
        return x | (x << 1)
    if v == 2:  # 8 bits -> each x4
        x = (x | (x << 12)) & _u32(0x000F000F)
        x = (x | (x << 6)) & _u32(0x03030303)
        x = (x | (x << 3)) & _u32(0x11111111)
        x = x | (x << 1)
        return x | (x << 2)
    if v == 4:  # 2 bits -> each x16
        lo = x & _u32(1)
        hi = (x >> 1) & _u32(1)
        return lo * _u32(0x0000FFFF) | hi * _u32(0xFFFF0000)
    raise ValueError(f"unsupported spread width {v}")


def _plane_gather(lo_planes, f_planes, v: int):
    """``out_p[s] = lo_planes[p][(s >> v) | (F(s) << (n - v))]`` for every
    plane; ``F(s)``'s bit j is ``f_planes[j]``.  All canonical packed
    ``[..., W]`` uint32 bit planes over the state axis (any leading dims).

    Canonical formulation, no transposes: output word ``k = q*2^v + r``
    takes bits ``[r*nb, (r+1)*nb)`` of lo word ``q`` in candidate region c
    (``nb = 32>>v``; region c = the contiguous word slice [c*Q, (c+1)*Q)).
    Realised as: repeat each source word 2^v times along the word axis (a
    lane-dim broadcast+reshape -- the only layout op), shift by the
    iota-derived ``nb*(k mod 2^v)``, mask, spread; the candidate masks are
    plain word-wise ANDs of the hi-window planes in their native layout.
    Everything stays elementwise over canonical ``[.., W]`` arrays -- the
    minor-axis ``swapaxes`` of the previous formulation relaid out every
    mask/output plane per level and made the v=4 level 6x slower than this
    on v5e (133 -> ~30 ms whole-repack at K=24 bench shapes).
    """
    W = lo_planes[0].shape[-1]
    Q = W >> v
    nb = 32 >> v
    lead = lo_planes[0].shape[:-1]
    # (Measured and rejected on v5e: flattening the leading dims to fill
    # sublane tiles wins 1.7x on isolated contiguous inputs but LOSES 1.7x
    # in the fused pipeline, where the reshape of strided window slices
    # forces extra copies -- tools/repack_marginal.py, 108 vs 181 ms.)
    run_mask = _u32((1 << nb) - 1)
    full = _u32(0xFFFFFFFF)
    r_shift = (jax.lax.broadcasted_iota(jnp.uint32, (W,), 0)
               & _u32((1 << v) - 1)) * _u32(nb)
    accs = [None] * len(lo_planes)
    for c in range(1 << v):
        m = full
        for j in range(v):
            pj = f_planes[j]
            m = m & (pj if (c >> j) & 1 else ~pj)
        for i, lp in enumerate(lo_planes):
            src = lp[..., c * Q : (c + 1) * Q]  # [.., Q]
            rep = jnp.broadcast_to(
                src[..., :, None], (*src.shape, 1 << v)
            ).reshape(*src.shape[:-1], W)
            cand = m & _spread((rep >> r_shift) & run_mask, v)
            accs[i] = cand if accs[i] is None else accs[i] | cand
    return [a.reshape(*lead, W) for a in accs]


@functools.partial(jax.jit, static_argnums=(0, 2, 4))
def build_plane_tables(code: CodeSpec, words: jnp.ndarray, anchor: int = 0,
                       g2: jnp.ndarray | None = None,
                       max_width: int = W_WALK) -> dict:
    """Build the G-level bit-plane tables from TIME-MAJOR decision words
    ``[T, B, W]`` (the update scan's native order; ``[B, T, W]`` callers
    pass ``words.transpose(1, 0, 2)``).

    Windows are anchored at ``t = anchor (mod width)``: pass ``anchor =
    K-1`` for whole-frame decodes so the walk stops at the first kept data
    bit (``anchor = 0`` reproduces a full walk to t=0).  Steps below
    ``anchor`` get no windows.

    Returns (``max_width = 4``, the default)::

        {"f4":  [n4, 4, B, W],   # nibble-packed F_4: state s's field in
                                 #   nibble (s>>2)&7 of word (d=s&3, s>>5)
         "g2":  [n2, B, W]}      # G_2 of window p (width-2 remainder segs)

    The G_4 planes are internal to the F_4 construction and are NOT stored:
    the walk only ever reads ``f4`` (full windows) and ``g2``/``words``
    (remainder segments), so materialising a stacked g4 table was pure
    relayout + HBM-write waste (~0.5 GB round trip per K=24 B=8 update).

    plus ``"f8": [n8, 8, B, W]`` (byte-packed F_8, state s in byte s&3 of
    word (d=(s>>2)&7, s>>5)) when ``max_width = 8``.  All uint32 canonical
    planes -- bit ``s & 31`` of word ``s >> 5``.  The width-2/1 remainder
    segments of :func:`plane_plan` read ``g2``/``words`` directly.  ``g2``
    may be supplied by the producer (``ops.pallas.large_k2``'s ``want_g2``
    emits it elementwise in VMEM; only valid for even anchors since kernel
    pairs anchor at even t) -- measured on v5e the jnp v=1 combine is
    cheaper than the kernel emission's extra DMA, so the default route
    builds it here.
    """
    n = code.K - 1
    if n < MIN_N:
        raise ValueError(f"plane tables need K-1 >= {MIN_N}, got {n}")
    if max_width not in (4, 8):
        raise ValueError(f"max_width must be 4 or 8, got {max_width}")
    T, B, W = words.shape
    Tn = T - anchor
    tables: dict[str, jnp.ndarray] = {}

    # Every combine is vectorized over ALL windows at once: _plane_gather
    # treats leading dims opaquely, so [nwin, B, W] plane stacks go through
    # in one fused pass, and window selection is a leading-axis slice.
    if g2 is None:
        n2 = Tn // 2
        d_lo = words[anchor : anchor + 2 * n2 : 2]
        d_hi = words[anchor + 1 : anchor + 2 * n2 : 2]
        (g2,) = _plane_gather([d_lo], [d_hi], 1)
    tables["g2"] = g2

    # Level 4: window [a+4p, a+4p+4).  F_2 of a 2-window = (G_2 << 1) |
    # D(last); hi 2-window = [a+4p+2, a+4p+4), lo = [a+4p, a+4p+2).
    n4 = Tn // 4
    d1_lo = words[anchor + 1 : anchor + 4 * n4 : 4]
    d1_hi = words[anchor + 3 : anchor + 4 * n4 : 4]
    g2_lo = g2[0 : 2 * n4 : 2]
    g2_hi = g2[1 : 2 * n4 : 2]
    g4_0, g4_1 = _plane_gather([d1_lo, g2_lo], [d1_hi, g2_hi], 2)

    # Nibble-pack F_4 = (G_4 << 2) | (G_2 << 1) | D(last) so the width-4
    # walk issues ONE single-word fetch per window per frame (a strided
    # multi-plane slice costs ~10x a one-word fetch on this platform).
    # f4[p, d] nibble e holds F_4(32w + 4e + d): bit j's nibble-LSB plane
    # for a fixed d is simply ``(plane_j >> d) & 0x11111111``.
    f4 = None
    d_shift = jnp.arange(4, dtype=jnp.uint32).reshape(1, 4, 1, 1)
    for j, p in enumerate([d1_hi, g2_hi, g4_0, g4_1]):
        x = (p[:, None, :, :] >> d_shift) & _u32(0x11111111)
        f4 = x << j if f4 is None else f4 | (x << j)
    tables["f4"] = f4  # [n4, 4, B, W]

    if max_width == 8:
        # Level 8: window [a+8p, a+8p+8).  The 16-candidate v=4 combine is
        # the expensive level (~70 ms at K=24 bench shapes, ~4x the rest
        # combined -- tools/repack_marginal.py), so it is opt-in: the
        # width-8 walk only halves already-pipelined ~0.5 us fetches.
        n8 = Tn // 8
        d3_lo = words[anchor + 3 : anchor + 8 * n8 : 8]
        d3_hi = words[anchor + 7 : anchor + 8 * n8 : 8]
        g2_4lo = g2[1 : 4 * n8 : 4]
        g2_4hi = g2[3 : 4 * n8 : 4]
        g4l = [g4_0[0 : 2 * n8 : 2], g4_1[0 : 2 * n8 : 2]]
        g4h = [g4_0[1 : 2 * n8 : 2], g4_1[1 : 2 * n8 : 2]]
        g8 = _plane_gather([d3_lo, g2_4lo, g4l[0], g4l[1]],
                           [d3_hi, g2_4hi, g4h[0], g4h[1]], 4)
        # Byte-pack the full field: f8[p, d, b, w] holds F_8 of states
        # ``32w + 4d + e`` in byte e.  The low nibble of F_8 IS F_4^{hi}
        # (the mask planes above).
        planes = [d3_hi, g2_4hi, g4h[0], g4h[1], *g8]
        nib = jnp.arange(8, dtype=jnp.uint32).reshape(1, 8, 1, 1) * _u32(4)
        f8 = None
        for j, p in enumerate(planes):
            x = (p[:, None, :, :] >> nib) & _u32(0xF)
            # bit i of the nibble -> bit 8i (byte i's LSB)
            x = (x | (x << 14)) & _u32(0x00030003)
            x = (x | (x << 7)) & _u32(0x01010101)
            x = x << j
            f8 = x if f8 is None else f8 | x
        tables["f8"] = f8  # [n8, 8, B, W]
    return tables


def _fetch_bit(arr, idx, pos):
    """Scalar bit ``pos`` of ``arr[idx...]`` via dynamic_slice."""
    word = jax.lax.dynamic_slice(arr, idx, (1,) * arr.ndim).reshape(())
    return ((word >> pos.astype(jnp.uint32)) & _u32(1)).astype(jnp.int32)


def chainback_plane_bits(
    code: CodeSpec,
    words: jnp.ndarray,
    tables: dict,
    num_data_bits: int,
    endstate: jnp.ndarray | int = 0,
    anchor: int = 0,
):
    """Traceback over the plane tables built at the same ``anchor``:
    one dependent fetch per frame per window (width 4 by default, 8 when
    the tables were built with ``max_width=8``).

    ``words`` is TIME-MAJOR ``[T, B, W]`` like the tables.  Walks from
    t = T down to t = ``anchor`` only -- decoded bits below ``K-1`` are
    initial-state bits the caller drops anyway (the reference's "look past
    tail" skip, viterbi27_sse2.cpp:97), so ``anchor = K-1`` removes their
    fetch rounds.  Requires ``anchor <= K-1`` (all kept bits walked).

    ``words`` may be ``None`` when ``T - anchor`` is a multiple of the
    walk width (every reference frame: ``T - (K-1) = 8*bytes``): the plan
    is then pure full-width windows and only ``tables["f4"]`` is read --
    the kernel-emitted-field route (``ops.pallas.large_k4
    .acs_update_large4_fields``) supplies exactly that, with no decision
    words materialised at all.  ``T`` is inferred from the table.

    Returns ``(bits [B, num_data_bits] uint8, state_at_anchor [B] int32)``.
    """
    f4 = tables.get("f4")
    f8 = tables.get("f8")
    g2 = tables.get("g2")
    if words is None:
        if f8 is not None:
            n8, _, B, W = f8.shape
            T = anchor + 8 * n8
        else:
            n4, _, B, W = f4.shape
            T = anchor + 4 * n4
    else:
        T, B, W = words.shape
    n = code.K - 1
    if anchor > n:
        raise ValueError("anchor must be <= K-1 (kept bits start at K-1)")
    mask = jnp.int32(code.num_states - 1)
    state = list(jnp.broadcast_to(
        jnp.asarray(endstate, dtype=jnp.int32) & mask, (B,)))

    segs = plane_plan(T, anchor, 8 if f8 is not None else 4)
    min_w = 8 if (words is None and f4 is None) else 4
    if words is None and any(w < min_w for _, w in segs):
        raise ValueError(
            "table-only walk needs T - anchor to be a multiple of the walk "
            f"width (got T={T}, anchor={anchor})")
    pieces: dict[int, tuple] = {}
    for t0, width in segs:
        a0 = t0 - anchor
        seg_F = []
        for b in range(B):
            s = state[b]
            idx = (s >> 5).astype(jnp.int32)
            pos = s & 31
            if width == 8:
                word = jax.lax.dynamic_slice(
                    f8, (a0 // 8, (s >> 2) & 7, b, idx), (1, 1, 1, 1)
                ).reshape(())
                F = ((word >> ((s & 3) * 8).astype(jnp.uint32))
                     & _u32(0xFF)).astype(jnp.int32)
            elif width == 4:
                word = jax.lax.dynamic_slice(
                    f4, (a0 // 4, s & 3, b, idx), (1, 1, 1, 1)).reshape(())
                F = ((word >> (((s >> 2) & 7) * 4).astype(jnp.uint32))
                     & _u32(0xF)).astype(jnp.int32)
            elif width == 2:
                F = ((_fetch_bit(g2, (a0 // 2, b, idx), pos) << 1)
                     | _fetch_bit(words, (t0 + 1, b, idx), pos))
            else:
                F = _fetch_bit(words, (t0, b, idx), pos)
            state[b] = (s >> width) | (F << (n - width))
            seg_F.append(F)
        pieces[t0] = (jnp.stack(seg_F), width)

    cols = []
    for t0 in sorted(pieces):
        F, width = pieces[t0]
        shifts = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
        cols.append(((F[:, None] >> shifts) & 1).astype(jnp.uint8))
    bits = jnp.concatenate(cols, axis=1)
    end_state = jnp.stack(state)
    keep0 = code.K - 1 - anchor
    return bits[:, keep0 : keep0 + num_data_bits], end_state


def chainback_planes(code, words, tables, num_data_bits, endstate=0,
                     anchor: int = 0):
    """Decode to bytes ``[B, num_data_bits // 8]`` uint8 (MSB-first)."""
    bits, _ = chainback_plane_bits(code, words, tables, num_data_bits,
                                   endstate, anchor)
    return bits_to_bytes(bits)
