"""Depth-4 fused state-blocked ACS for very large trellises (K=24).

``large_k2`` fuses two trellis steps per launch, so the metric vector
crosses HBM once per pair plus one whole-array XLA column re-interleave per
pair (the stride permutation ``col -> 4 col + q`` that no static carry
layout can absorb -- see the ``KA9Q_TPU_LK2_RESIDUE`` note there).  This
kernel fuses FOUR steps: intermediates live in raw butterfly coordinates
for three levels instead of one, the metric tensor crosses HBM once per
QUAD, and the (now mod-16) column re-interleave runs once per four steps --
both halving again relative to depth 2.

Coordinate algebra (state layout ``s = 32 c + g``; all intermediate arrays
are indexed by the ORIGINAL predecessor coordinates ``(g, c)`` plus
accumulated input bits):

    level 1: i1 = 64 c + 2 g + b1                  (pairs: input ranges m, m+8)
    level 2: i2 = 128 c + 4 g + k2, k2 = 2 b1 + b2 (pairs: groups m2, m2+4)
    level 3: i3 = 256 c + 8 g + k3, k3 = 2 k2 + b3 (pairs: groups m3, m3+2)
    level 4: f  = 512 c + 16 g + k4, k4 = 2 k3 + b4 (pairs: groups 0, 1)

    column(f) = 16 c + (g >> 1)      -> mod-16 column residues, contiguous
    row(f)    = 16 (g & 1) + k4      -> a sublane interleave (supported)

Each level's decision words pack with weighted sublane reductions at that
level's own coordinates (word col ``2^l c + (g >> (5-l))``, bit
``2^l (g & (2^(5-l)-1)) + k``), so decisions leave the kernel bit-packed in
the framework's canonical state-indexed layout after one cheap XLA
transpose per word tensor.

Inputs per grid block j (final states ``[j*blk, (j+1)*blk)``): the sixteen
original predecessor column ranges ``P0 + k*S/16``, each contiguous; every
intermediate is consumed by exactly one final block (no recomputation).
Branch penalties stream the static parity tables (the measured-neutral
large_k2 default, required here: R <= 2).

G_2 radix planes are NOT emitted: the routed K=24 plane build constructs
them from the words in jnp (measured cheaper than kernel emission --
``ops.radix_planes.build_plane_tables``); callers needing ``want_g2`` use
``large_k2``.

Used for ``T // 4`` quads; the 0-3 step remainder delegates to
``large_k2.acs_update_large2`` (which itself handles its odd tail).

**Direct field emission** (``acs_update_large4_fields``): the ACS's
surviving predecessor IS the traceback next-state (``pred = (i >> 1) |
(d << (K-2))``, ref: ka9q_libfec_port/viterbi27_sse2.cpp:101-102), so the
kernel can propagate each intermediate's packed survivor-path bits through
its four levels with one extra select per level -- ``pf_l(i) =
(pf_{l-1}(pred_win) << 1) | d_l`` -- and emit the width-4 walk field
``F_4`` of every final state directly, nibble-packed in the exact layout
``ops.radix_planes.build_plane_tables`` produces (state ``s`` in nibble
``(s>>2)&7`` of word ``(d=s&3, s>>5)``).  That removes the whole
XLA-side radix repack from the K=24 update phase (the repack ran at ~12 %
of HBM because Mosaic cannot lower its lane repeat -- ARCHITECTURE.md) at
the cost of in-kernel selects the VPU has headroom for; decision words are
NOT written in this mode (the walk never reads them when the window span
``T - anchor`` is a multiple of 4, which every reference frame satisfies:
``T - (K-1) = 8*bytes``), so decision-related HBM writes are unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import CodeSpec, NumericSpec
from . import large_k, large_k2

__all__ = ["acs_update_large4", "acs_update_large4_fields",
           "acs_update_large4_fields8"]

PACK = 32


@functools.lru_cache(maxsize=8)
def _par_tables4_np(code: CodeSpec):
    """Step t+2 / t+3 branch parities in kernel block layout.

    Returns ``(t2, t3)``:
      * ``t2[k2, g, c]`` -- bit r = parity of level-2 intermediate
        ``i2 = 128 c + 4 g + k2`` against ``poly_r >> 1`` (c in [0, C/8)).
      * ``t3[k3, g, c]`` -- same for ``i3 = 256 c + 8 g + k3``
        (c in [0, C/16)).
    """
    S = code.num_states
    C = S // PACK
    g = np.arange(PACK, dtype=np.int64)[:, None]
    c2 = np.arange(C // 8, dtype=np.int64)[None, :]
    c3 = np.arange(C // 16, dtype=np.int64)[None, :]
    t2 = np.zeros((4, PACK, C // 8), np.int32)
    t3 = np.zeros((8, PACK, C // 16), np.int32)
    for r, p in enumerate(code.abs_polys()):
        mask = p >> 1
        for k2 in range(4):
            i2 = 128 * c2 + 4 * g + k2
            t2[k2] |= large_k2._parity64_np(i2 & mask) << r
        for k3 in range(8):
            i3 = 256 * c3 + 8 * g + k3
            t3[k3] |= large_k2._parity64_np(i3 & mask) << r
    return t2, t3


def _quad_kernel(code: CodeSpec, numeric: NumericSpec, Lb: int, NB: int, mdt,
                 want_fields: bool = False, want_f8: bool = False):
    """Lb: predecessor columns per input range block (= blk / (16*32)).

    ``want_fields``: emit the nibble-packed width-4 walk field table
    instead of the four per-step decision-word tensors (see module
    docstring); output refs become ``(m_out, f4)``.

    ``want_f8`` (implies fields mode): additionally consume the PREVIOUS
    quad's f4 table (16 plane-range inputs after the parity tables) and
    emit the byte-packed width-8 field ``F_8 = F_4^{prev}[origin] << 4 |
    F_4^{this}`` instead of f4.  The previous-window field rides the SAME
    per-level survivor select as the path bits -- the combined value
    ``comb = (select(d, comb_hi, comb_lo) << 1) | d``, seeded at level 1
    with the unpacked predecessor fields shifted left, accumulates both
    halves with zero extra selects; output refs become ``(m_out, f8
    [B, 2, 4, 16, Lb])`` (par = g&1, h = k4>>2, q4 = g>>1)."""
    K, R = code.K, code.R
    low = numeric.soft_low
    high = numeric.soft_high
    hl = high + low
    abs_polys = code.abs_polys()
    invs = code.inversions()
    bb = [tuple(((b & p & 1) ^ (1 if inv else 0))
                for p, inv in zip(abs_polys, invs)) for b in (0, 1)]
    ch = tuple((p >> (K - 1)) & 1 for p in abs_polys)

    def kpack(kvec):
        return sum(k << r for r, k in enumerate(kvec))

    def kernel(*refs):
        ins = refs[:16]                  # 16 x [B, 32, Lb] predecessor metrics
        sym_ref = refs[16]               # [B, 4*R] steps t..t+3 flattened
        t0s = refs[17:25]                # 8 x [32, Lb]   (m = 0..7)
        t1s = refs[25:33]                # 8 x [32, Lb]   (b1*4 + m2)
        t2s = refs[33:35]                # 2 x [4, 32, Lb] (m3)
        t3_ref = refs[35]                # [8, 32, Lb]
        if want_f8:
            f4ps = refs[36:52]           # 16 x [B, 4, Lb] prev f4 planes
            m_out_ref, f8_ref = refs[52:54]
        elif want_fields:
            m_out_ref, f4_ref = refs[36:38]
        else:
            m_out_ref, w1_ref, w2_ref, w3_ref, w4_ref = refs[36:41]
        B = ins[0].shape[0]

        if want_f8:
            # Unpack the previous window's field per predecessor range:
            # state s = 32c + g holds its nibble at plane d = g&3, nibble
            # g>>2 of word c (the f4 output layout in natural word order).
            # Sublane row g = 4q + d assembles as a (q, d) interleave --
            # the supported sublane direction -- instead of a 4-way
            # where-chain (the where form cost ~13 ops/range and showed up
            # as the f8 kernel's ~10 % update deficit vs f4).
            nib4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2) * 4
            Vs = []
            for k in range(16):
                P = f4ps[k][:]
                x = jnp.broadcast_to(P[:, :, None, :], (B, 4, 8, Lb))
                x = jax.lax.shift_right_logical(x, nib4) & 0xF
                Vs.append(x.transpose(0, 2, 1, 3).reshape(B, PACK, Lb))

        # Per-step symbol affine pieces (compute int32; storage mdt).
        bases = []
        coefs = []
        for step in range(4):
            base_s = jnp.zeros((B, 1, 1), dtype=jnp.int32)
            cf = []
            for r in range(R):
                y = sym_ref[:, step * R + r].reshape(B, 1, 1)
                base_s = base_s + (y - low)
                cf.append(hl - 2 * y)
            bases.append(jnp.broadcast_to(base_s, (B, PACK, 1)))
            coefs.append([jnp.broadcast_to(x, (B, PACK, 1)) for x in cf])

        def table_pens(step, tbl):
            """Penalty factory over one parity-combo table block [32, Lb]
            (same factored form as large_k2._pair_kernel.table_pens)."""
            tbl3 = tbl.reshape(1, PACK, Lb)
            prods = [((tbl3 >> r) & 1) * coefs[step][r] for r in range(R)]
            combos = {}

            def pen(kbits):
                if kbits not in combos:
                    vec = None
                    sca = bases[step]
                    for r in range(R):
                        if (kbits >> r) & 1:
                            sca = sca + coefs[step][r]
                            vec = -prods[r] if vec is None else vec - prods[r]
                        else:
                            vec = prods[r] if vec is None else vec + prods[r]
                    combos[kbits] = sca + vec
                return combos[kbits]

            return pen

        def acs(lo, hi, pen, b):
            pen_lo = pen(kpack(bb[b]))
            pen_hi = pen(kpack(tuple(k ^ c for k, c in zip(bb[b], ch))))
            c_lo = lo + pen_lo
            c_hi = hi + pen_hi
            d = c_hi < c_lo  # ties keep the low predecessor
            return jnp.where(d, c_hi, c_lo), d

        def pf_step(d, pf_hi, pf_lo):
            # Survivor-path field: prepend this level's decision at bit 0
            # (the walk consumes latest-first) above the winning
            # predecessor's accumulated field.
            return (jnp.where(d, pf_hi, pf_lo) << 1) | d.astype(jnp.int32)

        def w_shift(height, stride, k):
            q = jax.lax.broadcasted_iota(jnp.int32, (1, height, 1), 1)
            return jax.lax.shift_left(jnp.ones((1, height, 1), jnp.int32),
                                      stride * q + k)

        # ---- level 1 (step t): 8 groups x b1 ----
        cand1 = {}
        d1 = {}
        for m in range(8):
            lo = ins[m][:].astype(jnp.int32)
            hi = ins[m + 8][:].astype(jnp.int32)
            pen = table_pens(0, t0s[m][:])
            for b1 in (0, 1):
                cand1[(m, b1)], d1[(m, b1)] = acs(lo, hi, pen, b1)
        if not (want_fields or want_f8):
            # step-t words: i1 = 64c + 2g + b1 -> word col 2c + (g>=16),
            # bit 2*(g&15) + b1.  w1_ref row 2m + par.
            for m in range(8):
                for par, sl in ((0, slice(0, 16)), (1, slice(16, 32))):
                    acc = (d1[(m, 0)][:, sl] * w_shift(16, 2, 0)
                           + d1[(m, 1)][:, sl] * w_shift(16, 2, 1))
                    w1_ref[:, 2 * m + par] = acc.sum(axis=1)

        # Path-field seed: the level-1 decision alone (f4 mode), or the
        # previous window's field select riding the same decision (f8).
        pf1 = {}
        if want_fields or want_f8:
            for (m, b1), d in d1.items():
                if want_f8:
                    pf1[(m, b1)] = pf_step(d, Vs[m + 8], Vs[m])
                else:
                    pf1[(m, b1)] = d.astype(jnp.int32)

        # ---- level 2 (step t+1): 4 groups x k2 ----
        cand2 = {}
        d2 = {}
        pf2 = {}
        for m2 in range(4):
            for b1 in (0, 1):
                pen = table_pens(1, t1s[b1 * 4 + m2][:])
                for b2 in (0, 1):
                    k2 = 2 * b1 + b2
                    cand2[(m2, k2)], d2[(m2, k2)] = acs(
                        cand1[(m2, b1)], cand1[(m2 + 4, b1)], pen, b2)
                    if want_fields or want_f8:
                        pf2[(m2, k2)] = pf_step(
                            d2[(m2, k2)], pf1[(m2 + 4, b1)], pf1[(m2, b1)])
        if not (want_fields or want_f8):
            # step-t+1 words: i2 -> word col 4c + (g>>3), bit 4*(g&7) + k2.
            for m2 in range(4):
                for q in range(4):
                    rows = slice(8 * q, 8 * q + 8)
                    acc = None
                    for k2 in range(4):
                        piece = d2[(m2, k2)][:, rows] * w_shift(8, 4, k2)
                        acc = piece if acc is None else acc + piece
                    w2_ref[:, 4 * m2 + q] = acc.sum(axis=1)

        # ---- level 3 (step t+2): 2 groups x k3 ----
        cand3 = {}
        d3 = {}
        pf3 = {}
        for m3 in range(2):
            for k2 in range(4):
                pen = table_pens(2, t2s[m3][k2])
                for b3 in (0, 1):
                    k3 = 2 * k2 + b3
                    cand3[(m3, k3)], d3[(m3, k3)] = acs(
                        cand2[(m3, k2)], cand2[(m3 + 2, k2)], pen, b3)
                    if want_fields or want_f8:
                        pf3[(m3, k3)] = pf_step(
                            d3[(m3, k3)], pf2[(m3 + 2, k2)], pf2[(m3, k2)])
        if not (want_fields or want_f8):
            # step-t+2 words: i3 -> word col 8c + (g>>2), bit 8*(g&3) + k3.
            for m3 in range(2):
                for q3 in range(8):
                    rows = slice(4 * q3, 4 * q3 + 4)
                    acc = None
                    for k3 in range(8):
                        piece = d3[(m3, k3)][:, rows] * w_shift(4, 8, k3)
                        acc = piece if acc is None else acc + piece
                    w3_ref[:, 8 * m3 + q3] = acc.sum(axis=1)

        # ---- level 4 (step t+3): final states ----
        cand4 = {}
        d4 = {}
        pf4 = {}
        for k3 in range(8):
            pen = table_pens(3, t3_ref[k3])
            for b4 in (0, 1):
                k4 = 2 * k3 + b4
                cand4[k4], d4[k4] = acs(
                    cand3[(0, k3)], cand3[(1, k3)], pen, b4)
                if want_fields or want_f8:
                    pf4[k4] = pf_step(d4[k4], pf3[(1, k3)], pf3[(0, k3)])
        # step-t+3 words + final metrics: f -> word col 16c + (g>>1),
        # bit 16*(g&1) + k4; metric rows 16*(g&1) + k4 of residue q4 = g>>1.
        # In fields mode the walk-field nibble of final state f sits at
        # nibble e = 4*(g&1) + (k4>>2) of word (d = k4&3, 16c + (g>>1)) --
        # the radix_planes f4 layout exactly.
        def f_shift(h):
            q = jax.lax.broadcasted_iota(jnp.int32, (1, 2, 1), 1)
            return jax.lax.shift_left(jnp.ones((1, 2, 1), jnp.int32),
                                      16 * q + 4 * h)

        for q4 in range(16):
            rows = slice(2 * q4, 2 * q4 + 2)
            if want_f8:
                # F_8 byte of state f at byte e = k4&3 of word (d8 =
                # 4*(g&1) + (k4>>2), 16c + q4); both row parities pack in
                # one pass (par = row index within the 2-row slice).
                for h in range(4):
                    acc = None
                    for e in range(4):
                        piece = pf4[4 * h + e][:, rows] * (1 << (8 * e))
                        acc = piece if acc is None else acc + piece
                    f8_ref[:, :, h, q4] = acc
            elif want_fields:
                for dd in range(4):
                    acc = None
                    for h in range(4):
                        piece = pf4[4 * h + dd][:, rows] * f_shift(h)
                        acc = piece if acc is None else acc + piece
                    f4_ref[:, dd, q4] = acc.sum(axis=1)
            else:
                acc = None
                for k4 in range(16):
                    piece = d4[k4][:, rows] * w_shift(2, 16, k4)
                    acc = piece if acc is None else acc + piece
                w4_ref[:, q4] = acc.sum(axis=1)
            stacked = jnp.stack(
                [cand4[k4][:, rows] for k4 in range(16)], axis=2
            ).reshape(B, PACK, Lb)
            m_out_ref[:, q4] = stacked.astype(mdt)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def acs_update_large4(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics: jnp.ndarray,
    symbols: jnp.ndarray,
    interpret: bool = False,
    metric_dtype: str | None = None,
    time_major: bool = False,
):
    """Four-steps-per-launch ACS; contract of ``large_k2.acs_update_large2``
    (without ``want_g2``): returns ``(metrics [B, S] int32, words uint32
    [B, T, W] or [T, B, W] when ``time_major``, offset [B] int32)``.
    """
    if code.R > 2:
        raise ValueError("depth-4 kernel streams parity tables (R <= 2)")
    B, S = metrics.shape
    _, T, R = symbols.shape
    metrics, entry_shift = large_k._shift_to_zero(metrics)
    blk = large_k.pick_state_block(code)
    NB = S // blk
    C = S // PACK
    Lb = blk // (16 * PACK)
    assert NB * Lb * 16 == C

    if metric_dtype is None:
        metric_dtype = numeric.metric_dtype
    if metric_dtype != "auto":
        mdt = jnp.dtype(metric_dtype).type
    else:
        mdt = large_k.metric_dtype_for(code, numeric, T)
    # In-scan renormalisation cadence in QUADS (4 steps each) -- the same
    # decision-invariant constant-shift argument as large_k2.
    rn = 0
    mbe = numeric.max_branch_error(R)
    spread = numeric.initial_margin + (code.K - 1) * mbe
    if spread + (T + 8) * mbe >= 30000:
        rn_fit = (29000 - spread) // max(1, 4 * mbe)
        if mdt == jnp.int16:
            if rn_fit < 1:
                raise ValueError(
                    f"int16 metrics cannot hold the {numeric.name} spread "
                    f"{spread} even with per-quad renormalisation")
            rn = max(1, int(rn_fit))
        elif metric_dtype == "auto" and rn_fit >= 2:
            mdt = jnp.int16
            rn = int(rn_fit)

    kernel = _quad_kernel(code, numeric, Lb, NB, mdt)
    in_spec = lambda k: pl.BlockSpec(
        (B, PACK, Lb), lambda j, k=k: (0, 0, j + k * NB),
        memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((B, 4 * R), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    tspec = lambda off: pl.BlockSpec(
        (PACK, Lb), lambda j, off=off: (0, j + off), memory_space=pltpu.VMEM)
    t2spec = lambda off: pl.BlockSpec(
        (4, PACK, Lb), lambda j, off=off: (0, 0, j + off),
        memory_space=pltpu.VMEM)
    t3spec = pl.BlockSpec((8, PACK, Lb), lambda j: (0, 0, j),
                          memory_space=pltpu.VMEM)

    t0_np, t1_np = large_k2._par_tables_np(code)
    t2_np, t3_np = _par_tables4_np(code)
    t0 = jnp.asarray(t0_np)
    t1a, t1b = jnp.asarray(t1_np[0]), jnp.asarray(t1_np[1])
    t2 = jnp.asarray(t2_np)
    t3 = jnp.asarray(t3_np)

    in_specs = [in_spec(k) for k in range(16)]
    in_specs.append(sym_spec)
    in_specs += [tspec(m * NB) for m in range(8)]          # t0 x 8
    in_specs += [tspec(m2 * NB) for m2 in range(4)]        # t1a x 4
    in_specs += [tspec(m2 * NB) for m2 in range(4)]        # t1b x 4
    in_specs += [t2spec(0), t2spec(NB)]                    # t2 x 2
    in_specs.append(t3spec)                                # t3

    m_shape = jax.ShapeDtypeStruct((B, 16, PACK, C // 16), mdt)
    w_shape = jax.ShapeDtypeStruct((B, 16, C // 16), jnp.int32)
    out_specs = [
        pl.BlockSpec((B, 16, PACK, Lb), lambda j: (0, 0, 0, j),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((B, 16, Lb), lambda j: (0, 0, j),
                      memory_space=pltpu.VMEM)] * 4

    step_call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[m_shape] + [w_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    C16 = C // 16
    T4 = T // 4
    m3 = metrics.reshape(B, C, PACK).transpose(0, 2, 1).astype(mdt)

    def words_nat(w1, w2, w3, w4):
        w1n = w1.reshape(B, 8, 2, C16).transpose(0, 1, 3, 2).reshape(B, C)
        w2n = w2.reshape(B, 4, 4, C16).transpose(0, 1, 3, 2).reshape(B, C)
        w3n = w3.reshape(B, 2, 8, C16).transpose(0, 1, 3, 2).reshape(B, C)
        w4n = w4.transpose(0, 2, 1).reshape(B, C)
        return jnp.stack([w1n, w2n, w3n, w4n], axis=0)  # [4, B, C]

    if T4:
        sym_quads = symbols[:, : 4 * T4].reshape(B, T4, 4 * R).transpose(1, 0, 2)

        def quad_body(carry, xs):
            m3, off = carry
            i, sym_quad = xs
            args = (m3,) * 16
            m_out, w1, w2, w3, w4 = step_call(
                *args, sym_quad, *(t0,) * 8, t1a, t1a, t1a, t1a,
                t1b, t1b, t1b, t1b, t2, t2, t3)
            m_next = m_out.transpose(0, 2, 3, 1).reshape(B, PACK, C)
            if rn:
                def renorm(m, o):
                    mn = m.min(axis=(1, 2))
                    return m - mn[:, None, None], o + mn.astype(jnp.int32)

                m_next, off = jax.lax.cond(
                    (i % rn) == rn - 1, renorm, lambda m, o: (m, o),
                    m_next, off)
            return (m_next, off), words_nat(w1, w2, w3, w4)

        off0 = jnp.zeros((B,), dtype=jnp.int32)
        xs = (jnp.arange(T4, dtype=jnp.int32), sym_quads)
        (m3, scan_off), words4 = jax.lax.scan(quad_body, (m3, off0), xs)
        entry_shift = entry_shift + scan_off
        words_tm = words4.reshape(T4 * 4, B, C)  # time-major
    else:
        words_tm = jnp.zeros((0, B, C), jnp.int32)

    m_final = m3.astype(jnp.int32).transpose(0, 2, 1).reshape(B, S)
    all_words = jax.lax.bitcast_convert_type(words_tm, jnp.uint32)

    rem = T - 4 * T4
    if rem:
        m_final, w_rem, rem_shift = large_k2.acs_update_large2.__wrapped__(
            code, numeric, m_final, symbols[:, 4 * T4 :], interpret,
            metric_dtype, False, True)
        all_words = jnp.concatenate([all_words, w_rem], axis=0)
        entry_shift = entry_shift + rem_shift

    if not time_major:
        all_words = all_words.transpose(1, 0, 2)
    return m_final, all_words, entry_shift


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def acs_update_large4_fields(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics: jnp.ndarray,
    symbols: jnp.ndarray,
    lead: int = 0,
    interpret: bool = False,
    metric_dtype: str | None = None,
):
    """Depth-4 update emitting the width-4 walk field table directly.

    ``lead`` initial trellis steps run through the depth-2 kernel (their
    decision words are discarded -- callers only use this route when the
    walk anchor is >= ``lead``, so those decisions are never read); the
    remaining ``T - lead`` steps (must be a multiple of 4) run through the
    field-propagating quad kernel.

    Returns ``(metrics [B, S] int32, f4 [T4, 4, B, W] uint32, offset [B]
    int32)`` where window p of ``f4`` covers trellis steps ``[lead + 4p,
    lead + 4p + 4)`` in the exact nibble-packed layout of
    ``ops.radix_planes.build_plane_tables`` (state ``s`` in nibble
    ``(s>>2)&7`` of word ``(d = s&3, s>>5)``), so
    ``ops.radix_planes.chainback_plane_bits`` walks it unchanged.
    """
    if code.R > 2:
        raise ValueError("depth-4 kernel streams parity tables (R <= 2)")
    B, S = metrics.shape
    _, T, R = symbols.shape
    if (T - lead) % 4:
        raise ValueError(f"T - lead must be a multiple of 4, got {T - lead}")
    entry_shift = jnp.zeros((B,), dtype=jnp.int32)
    if lead:
        metrics, _, entry_shift = large_k2.acs_update_large2.__wrapped__(
            code, numeric, metrics, symbols[:, :lead], interpret,
            metric_dtype, False, True)
    metrics, shift0 = large_k._shift_to_zero(metrics)
    entry_shift = entry_shift + shift0
    blk = large_k.pick_state_block(code)
    NB = S // blk
    C = S // PACK
    Lb = blk // (16 * PACK)
    assert NB * Lb * 16 == C

    T4 = (T - lead) // 4
    if metric_dtype is None:
        metric_dtype = numeric.metric_dtype
    if metric_dtype != "auto":
        mdt = jnp.dtype(metric_dtype).type
    else:
        mdt = large_k.metric_dtype_for(code, numeric, T)
    rn = 0
    mbe = numeric.max_branch_error(R)
    spread = numeric.initial_margin + (code.K - 1) * mbe
    if spread + (T + 8) * mbe >= 30000:
        rn_fit = (29000 - spread) // max(1, 4 * mbe)
        if mdt == jnp.int16:
            if rn_fit < 1:
                raise ValueError(
                    f"int16 metrics cannot hold the {numeric.name} spread "
                    f"{spread} even with per-quad renormalisation")
            rn = max(1, int(rn_fit))
        elif metric_dtype == "auto" and rn_fit >= 2:
            mdt = jnp.int16
            rn = int(rn_fit)

    kernel = _quad_kernel(code, numeric, Lb, NB, mdt, want_fields=True)
    in_spec = lambda k: pl.BlockSpec(
        (B, PACK, Lb), lambda j, k=k: (0, 0, j + k * NB),
        memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((B, 4 * R), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    tspec = lambda off: pl.BlockSpec(
        (PACK, Lb), lambda j, off=off: (0, j + off), memory_space=pltpu.VMEM)
    t2spec = lambda off: pl.BlockSpec(
        (4, PACK, Lb), lambda j, off=off: (0, 0, j + off),
        memory_space=pltpu.VMEM)
    t3spec = pl.BlockSpec((8, PACK, Lb), lambda j: (0, 0, j),
                          memory_space=pltpu.VMEM)

    t0_np, t1_np = large_k2._par_tables_np(code)
    t2_np, t3_np = _par_tables4_np(code)
    t0 = jnp.asarray(t0_np)
    t1a, t1b = jnp.asarray(t1_np[0]), jnp.asarray(t1_np[1])
    t2 = jnp.asarray(t2_np)
    t3 = jnp.asarray(t3_np)

    in_specs = [in_spec(k) for k in range(16)]
    in_specs.append(sym_spec)
    in_specs += [tspec(m * NB) for m in range(8)]
    in_specs += [tspec(m2 * NB) for m2 in range(4)]
    in_specs += [tspec(m2 * NB) for m2 in range(4)]
    in_specs += [t2spec(0), t2spec(NB)]
    in_specs.append(t3spec)

    C16 = C // 16
    m_shape = jax.ShapeDtypeStruct((B, 16, PACK, C16), mdt)
    f4_shape = jax.ShapeDtypeStruct((B, 4, 16, C16), jnp.int32)
    out_specs = [
        pl.BlockSpec((B, 16, PACK, Lb), lambda j: (0, 0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 4, 16, Lb), lambda j: (0, 0, 0, j),
                     memory_space=pltpu.VMEM),
    ]

    step_call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[m_shape, f4_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    m3 = metrics.reshape(B, C, PACK).transpose(0, 2, 1).astype(mdt)

    if T4:
        sym_quads = (symbols[:, lead : lead + 4 * T4]
                     .reshape(B, T4, 4 * R).transpose(1, 0, 2))

        def quad_body(carry, xs):
            m3, off = carry
            i, sym_quad = xs
            args = (m3,) * 16
            m_out, f4b = step_call(
                *args, sym_quad, *(t0,) * 8, t1a, t1a, t1a, t1a,
                t1b, t1b, t1b, t1b, t2, t2, t3)
            m_next = m_out.transpose(0, 2, 3, 1).reshape(B, PACK, C)
            if rn:
                def renorm(m, o):
                    mn = m.min(axis=(1, 2))
                    return m - mn[:, None, None], o + mn.astype(jnp.int32)

                m_next, off = jax.lax.cond(
                    (i % rn) == rn - 1, renorm, lambda m, o: (m, o),
                    m_next, off)
            # f4b [B, 4, 16, C16] -> natural word col 16c + q4 -> [4, B, C]
            f4n = (f4b.transpose(0, 1, 3, 2).reshape(B, 4, C)
                   .transpose(1, 0, 2))
            return (m_next, off), f4n

        off0 = jnp.zeros((B,), dtype=jnp.int32)
        xs = (jnp.arange(T4, dtype=jnp.int32), sym_quads)
        (m3, scan_off), f4_tm = jax.lax.scan(quad_body, (m3, off0), xs)
        entry_shift = entry_shift + scan_off
    else:
        f4_tm = jnp.zeros((0, 4, B, C), jnp.int32)

    m_final = m3.astype(jnp.int32).transpose(0, 2, 1).reshape(B, S)
    f4 = jax.lax.bitcast_convert_type(f4_tm, jnp.uint32)
    return m_final, f4, entry_shift


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def acs_update_large4_fields8(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics: jnp.ndarray,
    symbols: jnp.ndarray,
    lead: int = 0,
    interpret: bool = False,
    metric_dtype: str | None = None,
):
    """Depth-4 update over quad PAIRS emitting the width-8 walk table.

    Per pair: the first quad runs the f4-fields kernel (its nibble-packed
    table is the pair's only handoff), the second quad runs the f8 kernel,
    which seeds its field propagation with the first quad's fields at the
    predecessor ranges and byte-packs ``F_8`` directly -- one dependent
    fetch per EIGHT trellis steps for the walk, still no decision words
    and no XLA repack.  ``T - lead`` must be a multiple of 8 (every
    reference frame at ``lead = (K-1) % 8``: ``T - (K-1) = 8*bytes``).

    Returns ``(metrics [B, S] int32, f8 [T8, 8, B, W] uint32, offset [B]
    int32)`` with window p of ``f8`` covering steps ``[lead + 8p,
    lead + 8p + 8)`` in the ``ops.radix_planes`` f8 layout (state ``s`` in
    byte ``s&3`` of word ``(d8 = (s>>2)&7, s>>5)``).
    """
    if code.R > 2:
        raise ValueError("depth-4 kernel streams parity tables (R <= 2)")
    B, S = metrics.shape
    _, T, R = symbols.shape
    if (T - lead) % 8:
        raise ValueError(f"T - lead must be a multiple of 8, got {T - lead}")
    entry_shift = jnp.zeros((B,), dtype=jnp.int32)
    if lead:
        metrics, _, entry_shift = large_k2.acs_update_large2.__wrapped__(
            code, numeric, metrics, symbols[:, :lead], interpret,
            metric_dtype, False, True)
    metrics, shift0 = large_k._shift_to_zero(metrics)
    entry_shift = entry_shift + shift0
    blk = large_k.pick_state_block(code)
    NB = S // blk
    C = S // PACK
    Lb = blk // (16 * PACK)
    assert NB * Lb * 16 == C

    T8 = (T - lead) // 8
    if metric_dtype is None:
        metric_dtype = numeric.metric_dtype
    if metric_dtype != "auto":
        mdt = jnp.dtype(metric_dtype).type
    else:
        mdt = large_k.metric_dtype_for(code, numeric, T)
    rn = 0  # renormalisation cadence in PAIRS (8 steps each)
    mbe = numeric.max_branch_error(R)
    spread = numeric.initial_margin + (code.K - 1) * mbe
    if spread + (T + 8) * mbe >= 30000:
        rn_fit = (29000 - spread) // max(1, 8 * mbe)
        if mdt == jnp.int16:
            if rn_fit < 1:
                raise ValueError(
                    f"int16 metrics cannot hold the {numeric.name} spread "
                    f"{spread} even with per-pair renormalisation")
            rn = max(1, int(rn_fit))
        elif metric_dtype == "auto" and rn_fit >= 2:
            mdt = jnp.int16
            rn = int(rn_fit)

    kernel_a = _quad_kernel(code, numeric, Lb, NB, mdt, want_fields=True)
    kernel_b = _quad_kernel(code, numeric, Lb, NB, mdt, want_f8=True)
    in_spec = lambda k: pl.BlockSpec(
        (B, PACK, Lb), lambda j, k=k: (0, 0, j + k * NB),
        memory_space=pltpu.VMEM)
    plane_spec = lambda k: pl.BlockSpec(
        (B, 4, Lb), lambda j, k=k: (0, 0, j + k * NB),
        memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((B, 4 * R), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    tspec = lambda off: pl.BlockSpec(
        (PACK, Lb), lambda j, off=off: (0, j + off), memory_space=pltpu.VMEM)
    t2spec = lambda off: pl.BlockSpec(
        (4, PACK, Lb), lambda j, off=off: (0, 0, j + off),
        memory_space=pltpu.VMEM)
    t3spec = pl.BlockSpec((8, PACK, Lb), lambda j: (0, 0, j),
                          memory_space=pltpu.VMEM)

    t0_np, t1_np = large_k2._par_tables_np(code)
    t2_np, t3_np = _par_tables4_np(code)
    t0 = jnp.asarray(t0_np)
    t1a, t1b = jnp.asarray(t1_np[0]), jnp.asarray(t1_np[1])
    t2 = jnp.asarray(t2_np)
    t3 = jnp.asarray(t3_np)

    base_specs = [in_spec(k) for k in range(16)]
    base_specs.append(sym_spec)
    base_specs += [tspec(m * NB) for m in range(8)]
    base_specs += [tspec(m2 * NB) for m2 in range(4)]
    base_specs += [tspec(m2 * NB) for m2 in range(4)]
    base_specs += [t2spec(0), t2spec(NB)]
    base_specs.append(t3spec)

    C16 = C // 16
    m_shape = jax.ShapeDtypeStruct((B, 16, PACK, C16), mdt)
    m_spec = pl.BlockSpec((B, 16, PACK, Lb), lambda j: (0, 0, 0, j),
                          memory_space=pltpu.VMEM)
    f4_shape = jax.ShapeDtypeStruct((B, 4, 16, C16), jnp.int32)
    f4_spec = pl.BlockSpec((B, 4, 16, Lb), lambda j: (0, 0, 0, j),
                           memory_space=pltpu.VMEM)
    f8_shape = jax.ShapeDtypeStruct((B, 2, 4, 16, C16), jnp.int32)
    f8_spec = pl.BlockSpec((B, 2, 4, 16, Lb), lambda j: (0, 0, 0, 0, j),
                           memory_space=pltpu.VMEM)

    call_a = pl.pallas_call(
        kernel_a,
        grid=(NB,),
        in_specs=base_specs,
        out_specs=[m_spec, f4_spec],
        out_shape=[m_shape, f4_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    call_b = pl.pallas_call(
        kernel_b,
        grid=(NB,),
        in_specs=base_specs + [plane_spec(k) for k in range(16)],
        out_specs=[m_spec, f8_spec],
        out_shape=[m_shape, f8_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    m3 = metrics.reshape(B, C, PACK).transpose(0, 2, 1).astype(mdt)

    if T8:
        sym_pairs = (symbols[:, lead : lead + 8 * T8]
                     .reshape(B, T8, 8 * R).transpose(1, 0, 2))

        def pair_body(carry, xs):
            m3, off = carry
            i, sym_pair = xs
            m_out, f4b = call_a(
                *(m3,) * 16, sym_pair[:, : 4 * R], *(t0,) * 8,
                t1a, t1a, t1a, t1a, t1b, t1b, t1b, t1b, t2, t2, t3)
            m_mid = m_out.transpose(0, 2, 3, 1).reshape(B, PACK, C)
            f4n = f4b.transpose(0, 1, 3, 2).reshape(B, 4, C)
            m_out2, f8b = call_b(
                *(m_mid,) * 16, sym_pair[:, 4 * R :], *(t0,) * 8,
                t1a, t1a, t1a, t1a, t1b, t1b, t1b, t1b, t2, t2, t3,
                *(f4n,) * 16)
            m_next = m_out2.transpose(0, 2, 3, 1).reshape(B, PACK, C)
            if rn:
                def renorm(m, o):
                    mn = m.min(axis=(1, 2))
                    return m - mn[:, None, None], o + mn.astype(jnp.int32)

                m_next, off = jax.lax.cond(
                    (i % rn) == rn - 1, renorm, lambda m, o: (m, o),
                    m_next, off)
            # [B, 2(par), 4(h), 16(q4), C16] -> d8 = 4*par + h, natural
            # word col = 16c + q4 -> [8, B, C]
            f8n = (f8b.reshape(B, 8, 16, C16).transpose(0, 1, 3, 2)
                   .reshape(B, 8, C).transpose(1, 0, 2))
            return (m_next, off), f8n

        off0 = jnp.zeros((B,), dtype=jnp.int32)
        xs = (jnp.arange(T8, dtype=jnp.int32), sym_pairs)
        (m3, scan_off), f8_tm = jax.lax.scan(pair_body, (m3, off0), xs)
        entry_shift = entry_shift + scan_off
    else:
        f8_tm = jnp.zeros((0, 8, B, C), jnp.int32)

    m_final = m3.astype(jnp.int32).transpose(0, 2, 1).reshape(B, S)
    f8 = jax.lax.bitcast_convert_type(f8_tm, jnp.uint32)
    return m_final, f8, entry_shift
