"""Depth-2 fused variant of the VMEM-resident ACS kernel (K <= 9).

Same structure as ``kernels._acs_kernel`` but processes TWO trellis steps per
loop iteration, keeping the intermediate metrics in raw butterfly coordinates
(``i = 2*s2 + b1`` indexed by ``(b1, s2)``) so the intermediate sublane
interleave is never materialised:

* butterfly-2's predecessor pairing ``(i, i + S/2)`` is elementwise between
  the sublane halves of each raw candidate array (``i + S/2`` maps to
  ``(b1, s2 + S/4)``);
* butterfly-2's penalties index the expected-bit table at rows ``2*s2 + b1``,
  which is a second, statically re-arranged table (``e2``) rather than a
  strided in-kernel access;
* the final scatter ``f = 4*s2 + 2*b1 + b2`` is one interleave-by-4 sublane
  stack/reshape.

Per pair this saves one metric interleave, one scratch round-trip, and one
pass of loop overhead; decision words for BOTH steps still pack and write
per step (their layout is unchanged, so traceback is untouched).  The
``t_real`` mask handles an odd frame boundary with a predicated fix-up that
re-materialises the after-step-A metrics only on the boundary pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import CodeSpec, NumericSpec
from ..branch import transition_tables_jnp
from .kernels import _pack_weights, _vmem_limit, pick_time_block

__all__ = ["acs_update_tb2"]


def _acs_kernel2(code: CodeSpec, numeric: NumericSpec, TB: int, n_last: int):
    """``n_last``: trellis steps executed in the FINAL grid block (static).
    An odd boundary runs one statically-emitted A-only step instead of the
    old traced per-pair validity masks (which cost an extra [S, B] select and
    a predicated re-materialisation every pair)."""
    S = code.num_states
    S2 = S // 2
    S4 = S // 4
    W = max(1, S // 32)
    R = code.R
    low = numeric.soft_low
    hl = numeric.soft_high + numeric.soft_low
    # Same penalty factoring as kernels._acs_kernel: combos derive from the
    # x=0 expected-bit columns by static sign flips (two distinct arrays for
    # both-ends-tapped codes).
    flips = []
    for x in range(4):
        h, b = x >> 1, x & 1
        flips.append(tuple(
            ((b & p) ^ (h & (p >> (code.K - 1)))) & 1 for p in code.abs_polys()
        ))

    def factored_pens(e0_cols, coefs, base):
        """e0_cols[r]: [rows, 1] x=0 expected bits; coefs[r]/base: [1, B]."""
        prods = [e0_cols[r] * coefs[r] for r in range(R)]
        distinct = {}
        for x in range(4):
            f = flips[x]
            if f not in distinct:
                sv = base
                acc = None
                for r in range(R):
                    sv = sv + coefs[r] if f[r] else sv
                    signed = -prods[r] if f[r] else prods[r]
                    acc = signed if acc is None else acc + signed
                distinct[f] = acc + sv
        return [distinct[flips[x]] for x in range(4)]

    def pack(dec, B):
        if S >= 32:
            w = dec.reshape(W, 32, B) * _pack_weights(B)
        else:
            padz = jnp.zeros((32 - S, B), dtype=jnp.int32)
            w = jnp.concatenate([dec, padz], axis=0).reshape(1, 32, B) * _pack_weights(B)
        return w.sum(axis=1)

    def kernel(e_ref, e2_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr):
        # e_ref: [S2, 4R] natural-order expected bits (butterfly A);
        # e2_ref: [S4, 8R] expected bits at predecessor rows 2*s2 + b1,
        #         column ((b1*4 + x) * R + r) (butterfly B);
        # sym_ref: [TB, R, B]; dec_ref: [TB, W, B].
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            m_scr[:] = m_in_ref[:]

        def butterflyA(tA):
            """Step A in natural order; writes decisions, returns raw
            candidates ``cand[b1]`` (intermediate butterfly coordinates)."""
            symA = sym_ref[tA]  # [R, B]
            B = symA.shape[1]
            baseA = jnp.zeros((1, B), dtype=jnp.int32)
            coefsA = []
            for r in range(R):
                baseA = baseA + (symA[r : r + 1] - low)
                coefsA.append(hl - 2 * symA[r : r + 1])
            pensA = factored_pens(
                [e_ref[:, r : r + 1] for r in range(R)], coefsA, baseA)

            m = m_scr[:]
            mlo = m[:S2]
            mhi = m[S2:]
            cand = {}
            d1 = {}
            for b1 in (0, 1):
                c_lo = mlo + pensA[0 * 2 + b1]
                c_hi = mhi + pensA[1 * 2 + b1]
                d = c_hi < c_lo
                cand[b1] = jnp.where(d, c_hi, c_lo)
                d1[b1] = d.astype(jnp.int32)

            decA = jnp.stack([d1[0], d1[1]], axis=1).reshape(S, B)
            dec_ref[tA] = pack(decA, B)
            return cand

        def butterflyB(tB, cand):
            """Step B from raw intermediate coordinates; writes decisions and
            the interleaved-by-4 new metrics."""
            symB = sym_ref[tB]
            B = symB.shape[1]
            baseB = jnp.zeros((1, B), dtype=jnp.int32)
            coefB = []
            for r in range(R):
                baseB = baseB + (symB[r : r + 1] - low)
                coefB.append(hl - 2 * symB[r : r + 1])

            cand2 = {}
            d2 = {}
            for b1 in (0, 1):
                pens = factored_pens(
                    [e2_ref[:, b1 * 4 * R + r : b1 * 4 * R + r + 1]
                     for r in range(R)],
                    coefB, baseB)
                i_lo = cand[b1][:S4]
                i_hi = cand[b1][S4:]
                for b2 in (0, 1):
                    c_lo = i_lo + pens[0 * 2 + b2]
                    c_hi = i_hi + pens[1 * 2 + b2]
                    d = c_hi < c_lo
                    cand2[2 * b1 + b2] = jnp.where(d, c_hi, c_lo)
                    d2[2 * b1 + b2] = d.astype(jnp.int32)

            # Final scatter f = 4*s2 + 2*b1 + b2: interleave-by-4.
            new = jnp.stack([cand2[k] for k in range(4)], axis=1).reshape(S, B)
            decB = jnp.stack([d2[k] for k in range(4)], axis=1).reshape(S, B)
            dec_ref[tB] = pack(decB, B)
            m_scr[:] = new

        def pair(j, _):
            tA = 2 * j
            butterflyB(tA + 1, butterflyA(tA))
            return 0

        @pl.when(i < nb - 1)
        def _():
            jax.lax.fori_loop(0, TB // 2, pair, 0, unroll=False)

        @pl.when(i == nb - 1)
        def _():
            jax.lax.fori_loop(0, n_last // 2, pair, 0, unroll=False)
            if n_last % 2:
                # Odd boundary: one A-only step; its candidates interleave
                # straight into natural order.
                cand = butterflyA(n_last - 1)
                B = m_scr.shape[1]
                m_scr[:] = jnp.stack([cand[0], cand[1]], axis=1).reshape(S, B)
            m_out_ref[:] = m_scr[:]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def acs_update_tb2(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics_sb: jnp.ndarray,
    symbols_trb: jnp.ndarray,
    t_real: int,
    interpret: bool = False,
):
    """Drop-in replacement for ``kernels.acs_update_tb`` (same contract)."""
    S, B = metrics_sb.shape
    Tp, R, _ = symbols_trb.shape
    W = max(1, S // 32)
    TB = pick_time_block(code, B)
    if Tp % TB != 0:
        raise ValueError(f"padded T={Tp} not a multiple of time block {TB}")
    t_real = int(t_real)
    if not (0 < t_real <= Tp):
        raise ValueError(f"t_real={t_real} outside (0, {Tp}]")
    nb = -(-t_real // TB)
    n_last = t_real - (nb - 1) * TB

    e_nat = transition_tables_jnp(code)  # [4, R, S2]
    e_in = e_nat.transpose(2, 0, 1).reshape(S // 2, 4 * R)
    # e2[s2, (b1*4 + x)*R + r] = e_nat[x, r, 2*s2 + b1]
    e2 = jnp.stack([e_nat[:, :, b1::2] for b1 in (0, 1)], axis=0)  # [2,4,R,S4]
    e2_in = e2.transpose(3, 0, 1, 2).reshape(S // 4, 8 * R)

    kernel = _acs_kernel2(code, numeric, TB, n_last)
    m_out, dec = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((S // 2, 4 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S // 4, 8 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, W, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((S, B), jnp.int32)],
        out_shape=[
            jax.ShapeDtypeStruct((S, B), jnp.int32),
            jax.ShapeDtypeStruct((Tp, W, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(
                (S // 2) * 4 * R * 4 + (S // 4) * 8 * R * 4,
                2 * TB * R * B * 4,
                3 * S * B * 4,
                2 * TB * W * B * 4,
            ),
        ),
        interpret=interpret,
    )(e_in, e2_in, symbols_trb, metrics_sb)
    return m_out, jax.lax.bitcast_convert_type(dec, jnp.uint32)
