"""Fused Pallas TPU kernels for the Viterbi hot loops.

Re-design of the reference's two hot loops for the TPU memory hierarchy
(ref: ka9q_libfec_port/viterbi27_sse2.cpp:119-175 update, :78-105 chainback):

* Layout is **state-major** ``[S, B]``: trellis states on sublanes, a batch of
  B independent frames on the 128-wide lanes.  The reference's 16-SIMD-lane
  state parallelism becomes whole-vector ops over S; the batch axis B is the
  new parallelism the TPU adds (the reference decodes one frame at a time,
  ref: src/main.cpp:168).
* The per-bit C loop becomes a ``fori_loop`` inside one kernel invocation;
  the grid tiles time into blocks so symbols / decision words stream
  HBM<->VMEM through Pallas's pipeline while **path metrics stay resident in
  VMEM scratch across the whole frame** -- the scan carry never touches HBM
  (the reference's pointer-swapped metric buffers, viterbi27_sse2.cpp:167-171,
  live entirely on-chip here).
* Decisions are bit-packed along the state axis into uint32 words ``[W, B]``
  per step (W = S/32), the same state-indexed packing as the reference's
  decision unions (ref: viterbi615_sse2.cpp:13) -- built with a
  multiply-by-powers-of-two sublane reduction instead of movemask.
* Chainback walks the packed words backward with the time grid reversed; the
  per-step word lookup is a one-hot select over the W sublanes, and the
  serial bit-recurrence runs across all B lanes at once.

Metrics are int32: headroom makes the reference's renormalisation machinery
(ref: viterbi615_sse2.cpp:157-183) unnecessary for correctness; decisions are
bit-identical to the renormalising jnp path because renorm only ever
subtracts a constant from every state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import CodeSpec, NumericSpec
from ..branch import transition_tables_jnp

__all__ = ["acs_update_tb", "chainback_tb", "pick_time_block", "SUBLANE_PACK"]

SUBLANE_PACK = 32  # decision bits per packed word

# Usable VMEM on the target chip: device-derived (utils/chipinfo.py), with
# the v5e figure (128 MiB physical minus compiler headroom) as the off-TPU
# fallback.  Kept as a module constant name for the v5e value; routing
# predicates call ``vmem_cap()`` so other generations get their own budget.
VMEM_CAP = 110 * 1024 * 1024


def vmem_cap() -> int:
    from ...utils.chipinfo import chip_info

    return chip_info().vmem_usable


def _vmem_limit(*buffer_bytes: int) -> int:
    """Scoped-VMEM limit for a kernel: sum of resident buffers (pipelined
    blocks counted twice for double buffering by the caller) plus generous
    slack -- Mosaic's stack of live step temporaries (penalties, candidates,
    relayouts) can more than double the explicit footprint for large S."""
    need = int(sum(buffer_bytes) * 2.5)
    return min(max(need, 16 * 1024 * 1024), vmem_cap())


def _pack_weights(B: int) -> jnp.ndarray:
    """``[1, 32, 1]`` int32 bit weights 1 << j, built in-kernel (Pallas
    kernels cannot capture host constants).  1 << 31 wraps negative; only the
    bit pattern matters -- packed words are bitcast to uint32 downstream."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    return jax.lax.shift_left(jnp.ones((1, 32, 1), dtype=jnp.int32), j)


def pick_time_block(code: CodeSpec, batch: int, vmem_budget: int = 2 * 1024 * 1024) -> int:
    """Time-block size: bounded by the VMEM footprint of the streamed blocks
    (symbols in, decision words out), rounded to a multiple of 32.

    Cap at 256: the hardware sweep (tools/tb_sweep.py) measured TB=256 as the
    optimum for K=7 at both B=256 and B=512 (larger blocks are strictly
    slower: 2.33 G at TB=512 vs 3.38 G at TB=256 under like-for-like
    contention), and K=9 flat across 96-256."""
    S = code.num_states
    W = max(1, S // 32)
    per_step = (code.R + W) * batch * 4  # int32 symbols + uint32 words
    tb = max(32, min(256, vmem_budget // max(per_step, 1)))
    return (tb // 32) * 32


def _acs_kernel(code: CodeSpec, numeric: NumericSpec, TB: int, n_last: int,
                unroll: int = 1):
    """``n_last``: trellis steps executed in the FINAL grid block (static).

    Steps past the true frame length are simply never executed -- their
    decision words are left unwritten (chainback starts its walk at the true
    final step, so they are never read).  A traced per-step validity mask
    costs an extra [S, B] select + broadcast compare every step -- measured
    ~1.7x on the whole kernel -- for masking that static grid bounds give
    for free.
    """
    S = code.num_states
    S2 = S // 2
    W = max(1, S // 32)
    R = code.R
    low = numeric.soft_low
    hl = numeric.soft_high + numeric.soft_low
    # XOR-flip pattern per combo x = h*2 + b and polynomial r:
    # e_r(x) = e_r(0) ^ f_r(x) with f_r = (b & p_r) ^ (h & p_r >> (K-1)) --
    # only x=0's expected-bit columns are read; the other combos derive by
    # sign-flipping the shared products.  For codes whose every polynomial
    # taps both register ends (all six standard codes do), the four penalty
    # combos collapse to TWO distinct arrays (pen(1,1)=pen(0,0),
    # pen(0,1)=pen(1,0)), dropping the penalty build from 4R to ~R+2
    # state-wide ops per step.
    flips = []
    for x in range(4):
        h, b = x >> 1, x & 1
        flips.append(tuple(
            ((b & p) ^ (h & (p >> (code.K - 1)))) & 1 for p in code.abs_polys()
        ))

    def kernel(e_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr):
        # sym_ref: [TB, R, B] int32; e_ref: [S2, 4*R] int32;
        # m_in/m_out: [S, B] int32; dec_ref: [TB, W, B] int32 (uint32 bits).
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            m_scr[:] = m_in_ref[:]

        def step(t, _):
            sym = sym_ref[t]  # [R, B]
            # Affine branch-penalty pieces (ref metric identity: penalty for
            # expected bit e and symbol y is (y-low) + e*(high+low-2y),
            # reproducing ka9q's XOR-negation metric, viterbi27_sse2.cpp:137-146).
            base = jnp.zeros((1, sym.shape[1]), dtype=jnp.int32)
            coefs = []
            for r in range(R):
                base = base + (sym[r : r + 1] - low)
                coefs.append(hl - 2 * sym[r : r + 1])        # [1, B]
            prods = [
                e_ref[:, r : r + 1] * coefs[r] for r in range(R)  # x=0 cols
            ]
            distinct = {}
            for x in range(4):  # x = h*2 + b
                f = flips[x]
                if f not in distinct:
                    sv = base
                    acc = None
                    for r in range(R):
                        sv = sv + coefs[r] if f[r] else sv
                        signed = -prods[r] if f[r] else prods[r]
                        acc = signed if acc is None else acc + signed
                    distinct[f] = acc + sv
            pens = [distinct[flips[x]] for x in range(4)]  # [S2, B] each

            m = m_scr[:]
            mlo = m[:S2]
            mhi = m[S2:]
            cands = []
            decs = []
            for b in (0, 1):
                c_lo = mlo + pens[0 * 2 + b]
                c_hi = mhi + pens[1 * 2 + b]
                d = c_hi < c_lo  # ties keep the low predecessor (ka9q cmpgt,
                #                  ref: viterbi27_sse2.cpp:155-156)
                cands.append(jnp.where(d, c_hi, c_lo))
                decs.append(d.astype(jnp.int32))  # i1 vregs can't be relaid out
            # Interleave along sublanes: new[2*s2 + b] = cands[b][s2].
            B = m.shape[1]
            new = jnp.stack(cands, axis=1).reshape(S, B)
            dec = jnp.stack(decs, axis=1).reshape(S, B)
            m_scr[:] = new

            # Pack 32 state-decisions per uint32 word (movemask analogue).
            if S >= 32:
                w = dec.reshape(W, 32, B) * _pack_weights(B)
            else:
                pad = jnp.zeros((32 - S, B), dtype=jnp.int32)
                w = jnp.concatenate([dec, pad], axis=0).reshape(1, 32, B) * _pack_weights(B)
            dec_ref[t] = w.sum(axis=1)
            return 0

        if unroll <= 1:
            @pl.when(i < nb - 1)
            def _():
                jax.lax.fori_loop(0, TB, step, 0, unroll=False)

            @pl.when(i == nb - 1)
            def _():
                jax.lax.fori_loop(0, n_last, step, 0, unroll=False)
        else:
            # Pallas-TPU fori_loop only lowers unroll=1|all; group steps
            # statically instead (penalty builds of later steps in a group
            # are independent of the loop-carried metrics, giving Mosaic a
            # software-pipelining window).
            assert TB % unroll == 0

            def grp(g, _):
                for u in range(unroll):
                    step(g * unroll + u, 0)
                return 0

            @pl.when(i < nb - 1)
            def _():
                jax.lax.fori_loop(0, TB // unroll, grp, 0, unroll=False)

            @pl.when(i == nb - 1)
            def _():
                n_full = n_last // unroll
                jax.lax.fori_loop(0, n_full, grp, 0, unroll=False)
                for u in range(n_last % unroll):
                    step(n_full * unroll + u, 0)

        @pl.when(i == nb - 1)
        def _():
            m_out_ref[:] = m_scr[:]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def acs_update_tb(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics_sb: jnp.ndarray,
    symbols_trb: jnp.ndarray,
    t_real: int,
    interpret: bool = False,
    unroll: int = 1,
):
    """Fused ACS over a whole frame in state-major layout.

    Args:
      metrics_sb: ``[S, B]`` int32.
      symbols_trb: ``[Tp, R, B]`` int32, Tp a multiple of the time block.
      t_real: static int -- true number of trellis steps (<= Tp); steps
        beyond it are never executed and their decision words are undefined
        (chainback starts at step ``t_real``, so they are never read).

    Returns ``(metrics [S, B] int32, dec_words [Tp, W, B] uint32)``.
    """
    S, B = metrics_sb.shape
    Tp, R, _ = symbols_trb.shape
    W = max(1, S // 32)
    TB = pick_time_block(code, B)
    if Tp % TB != 0:
        raise ValueError(f"padded T={Tp} not a multiple of time block {TB}")
    t_real = int(t_real)
    if not (0 < t_real <= Tp):
        raise ValueError(f"t_real={t_real} outside (0, {Tp}]")
    nb = -(-t_real // TB)  # blocks that contain real steps
    n_last = t_real - (nb - 1) * TB

    # Built on device (no embedded literal): [S2, 4R].
    e_in = transition_tables_jnp(code).transpose(2, 0, 1).reshape(S // 2, 4 * R)

    kernel = _acs_kernel(code, numeric, TB, n_last, unroll)
    m_out, dec = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((S // 2, 4 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
                (S // 2) * 4 * R * 4,      # e table
                2 * TB * R * B * 4,        # symbol blocks (double-buffered)
                3 * S * B * 4,             # m_in + m_out + scratch
                2 * TB * W * B * 4,        # decision blocks (double-buffered)
            ),
        ),
        interpret=interpret,
    )(e_in, symbols_trb, metrics_sb)
    return m_out, jax.lax.bitcast_convert_type(dec, jnp.uint32)


def _chainback_kernel(code: CodeSpec, TB: int, n_last: int):
    S = code.num_states
    W = max(1, S // 32)
    K = code.K

    def kernel(dec_ref, end_ref, bits_ref, state_scr):
        # dec_ref: [TB, W, B] int32 words (time grid reversed);
        # end_ref: [1, B] int32; bits_ref: [Tp//32, B] int32 packed output --
        # the FULL (small) bits array stays VMEM-resident across the grid and
        # is written at global word offsets (a time-blocked spec would need
        # TB/32 sublane alignment Mosaic rejects for small blocks).
        nb = pl.num_programs(0)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            state_scr[:] = end_ref[:]

        # This grid step covers global steps [t_base, t_base + steps), walked
        # in reverse (the grid's index_map already reversed the block order).
        # Block i == 0 is the frame tail: only its first ``n_last`` steps are
        # real (static -- no per-step validity mask needed; steps past the
        # frame end are simply never walked).
        t_base = (nb - 1 - i) * TB
        B = end_ref.shape[1]
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)

        def make_step(steps):
            def step(j, acc):
                t = steps - 1 - j  # walk time in reverse
                state = state_scr[:]  # [1, B]
                words = dec_ref[t]    # [W, B]
                # One-hot word select over the W sublanes (the reference's
                # d[s >> 5] indexing, viterbi615_sse2.cpp:86), as a fused
                # masked-select + sum (one pass fewer than cmp/cast/mult).
                word = jnp.where(w_iota == (state >> 5), words, 0).sum(
                    axis=0, keepdims=True)  # [1, B]
                k = jax.lax.shift_right_logical(word, state & 31) & 1
                new_state = jax.lax.shift_right_logical(state, 1) | (k << (K - 2))
                state_scr[:] = new_state
                # Accumulate decoded bits, 32 steps per packed word (bit t%32
                # = step t); in reverse order a word's last visit is t%32 == 0.
                acc = jnp.where((t & 31) == 31, jnp.zeros_like(acc), acc) | (
                    k << (t & 31))

                @pl.when((t & 31) == 0)
                def _():
                    bits_ref[pl.ds(t_base // 32 + t // 32, 1)] = acc

                return acc

            return step

        acc0 = jnp.zeros((1, B), dtype=jnp.int32)

        @pl.when(i == 0)
        def _():
            jax.lax.fori_loop(0, n_last, make_step(n_last), acc0, unroll=False)

        @pl.when(i > 0)
        def _():
            jax.lax.fori_loop(0, TB, make_step(TB), acc0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def chainback_tb(
    code: CodeSpec,
    dec_words: jnp.ndarray,
    endstate: jnp.ndarray,
    t_real: int,
    interpret: bool = False,
):
    """Traceback over state-major packed decisions.

    Args:
      dec_words: ``[Tp, W, B]`` uint32/int32 from ``acs_update_tb``.
      endstate: ``[1, B]`` int32 survivor state at step ``t_real``.
      t_real: static int; the walk starts at step ``t_real - 1``.

    Returns packed trellis bits ``[Tp // 32, B]`` uint32 -- bit ``t % 32`` of
    word ``t // 32`` is the walk output at step t (data bit ``t - K + 1``).
    """
    Tp, W, B = dec_words.shape
    TB = pick_time_block(code, B)
    if Tp % TB != 0:
        raise ValueError(f"padded T={Tp} not a multiple of time block {TB}")
    t_real = int(t_real)
    if not (0 < t_real <= Tp):
        raise ValueError(f"t_real={t_real} outside (0, {Tp}]")
    nb = -(-t_real // TB)
    n_last = t_real - (nb - 1) * TB

    kernel = _chainback_kernel(code, TB, n_last)
    bits = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, W, B), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Tp // 32, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
        out_shape=[jax.ShapeDtypeStruct((Tp // 32, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(
                2 * TB * W * B * 4,        # decision blocks (double-buffered)
                (Tp // 32) * B * 4,        # resident bits output
                2 * B * 4,                 # end state + scratch
            ),
        ),
        interpret=interpret,
    )(
        jax.lax.bitcast_convert_type(dec_words, jnp.int32),
        endstate.astype(jnp.int32),
    )
    return jax.lax.bitcast_convert_type(bits[0], jnp.uint32)
