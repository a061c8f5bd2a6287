"""State-blocked ACS kernel for very large trellises (K=24 "ICE").

The K<=15 kernels keep the whole metric vector VMEM-resident; K=24's 2^23
states x int32 = 32 MiB per buffer (the reference burns 2 x 16 MiB of heap
and streams it through SSE registers, ref: viterbi224_sse2.cpp:14-16), so
here the metric vectors live in HBM and each trellis step is one
``pallas_call`` whose grid tiles the *state* axis.

Layout is the key trick: state ``s`` maps to ``(sublane g = s % 32,
lane-column c = s // 32)``, i.e. metrics are ``[B, 32, S/32]``.  Under this
split:

* a contiguous range of predecessor states is a contiguous range of
  lane-columns (streamable with plain BlockSpecs);
* the butterfly's successor interleave ``new[2*s2+b]`` decomposes into a
  SUBLANE interleave (the pattern Mosaic supports natively; a pure lane
  interleave of 2^16-lane vectors does not lower) plus a column-parity
  split: the kernel writes even-numbered and odd-numbered output columns as
  two contiguous arrays, and one cheap XLA reshape re-interleaves columns
  between steps;
* the 32 states of one packed decision word are exactly one column's
  sublanes, so the movemask analogue is a multiply-by-2^g sublane reduction
  **in-kernel** -- decisions leave the kernel already packed (1 bit/state,
  the reference's decision-memory ratio, ref: viterbi224_sse2.cpp:14).

Branch penalties come from an in-kernel parity fold over a (g, c) iota
(identity ``parity(((s2<<1)|b|(h<<(K-1))) & p) = parity(s2 & (p>>1)) ^
(b & p) ^ (h & p>>(K-1))``) -- the materialised K=24 branch table would be
64 MiB (ref: viterbi224_sse2.cpp:16-20).

The time loop is a ``lax.scan``: one kernel launch per input bit, amortised
by the ~0.5 GB the butterfly moves per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import CodeSpec, NumericSpec

__all__ = ["acs_update_large", "pick_state_block"]

MAX_BLOCK = 1 << 17  # states per grid block
PACK = 32            # states per packed word = sublanes per column


def pick_state_block(code: CodeSpec) -> int:
    return min(code.num_states, MAX_BLOCK)


def _parity_fold(x: jnp.ndarray) -> jnp.ndarray:
    for shift in (16, 8, 4, 2, 1):
        x = x ^ (x >> shift)
    return x & 1


def metric_dtype_for(code: CodeSpec, numeric: NumericSpec, T: int):
    """int16 when the worst-case metric reachable within one update block fits
    with headroom (halves every metric byte moved -- the dominant cost); else
    int32.  The reference solves the same range problem with lazy
    renormalisation (ref: viterbi224_sse2.cpp:226-250).

    Blockwise-resume safe: callers shift incoming metrics to zero at block
    entry (``_shift_to_zero``), so the bound only needs the incoming *spread*,
    not the absolute accumulated value.  The spread of a Viterbi metric vector
    never exceeds ``initial_margin + (K-1) * max_branch_error``: every state is
    reachable from the current best state's survivor path within K-1
    transitions, each adding at most one worst-case branch penalty."""
    mbe = numeric.max_branch_error(code.R)
    spread = numeric.initial_margin + (code.K - 1) * mbe
    worst = spread + (T + 8) * mbe
    return jnp.int16 if worst < 30000 else jnp.int32


def _shift_to_zero(metrics: jnp.ndarray):
    """Per-frame shift-to-zero renormalisation at block entry.

    Subtracting a per-frame constant from every state's metric changes no
    compare-select decision (the invariant all renorm in this framework relies
    on, ref semantics: viterbi615_sse2.cpp:157-183); returning the shift keeps
    the caller's accumulated ``path_metric`` exact.  Required so
    ``metric_dtype_for``'s int16 bound holds for resumed blocks whose incoming
    metrics already carry many steps of accumulated error."""
    shift = metrics.min(axis=1)
    return metrics - shift[:, None], shift


def _step_kernel(code: CodeSpec, numeric: NumericSpec, Lb: int, mdt):
    """Grid block i: predecessors s2 in columns [i*Lb, (i+1)*Lb) (natural
    column index over the s2 space), plus the mirrored high half."""
    K, R = code.K, code.R
    low = numeric.soft_low
    high = numeric.soft_high

    def kernel(lo_ref, hi_ref, sym_ref, me_ref, mo_ref, we_ref, wo_ref):
        # lo/hi: [B, 32, Lb] predecessor metrics; sym: [B, R] int32.
        # me/mo: even/odd output columns [B, 32, Lb]; we/wo: packed decision
        # words per output column [B, Lb] (bit g = decision of state 32c+g).
        i = pl.program_id(0)
        B = lo_ref.shape[0]
        g = jax.lax.broadcasted_iota(jnp.int32, (1, PACK, Lb), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (1, PACK, Lb), 2) + i * Lb
        s2 = c * PACK + g  # [1, 32, Lb] global predecessor index

        # Storage is ``mdt`` (int16 when the accumulated range allows --
        # halves every byte the step moves); COMPUTE stays int32 because the
        # VPU lacks int16 compares and some narrow-dtype broadcasts.  Casts
        # happen at the refs.
        pars = [_parity_fold(s2 & (p >> 1)) for p in code.abs_polys()]  # int32
        hl = high + low
        base = jnp.zeros((B, 1, 1), dtype=jnp.int32)
        coefs = []
        for r in range(R):
            y = sym_ref[:, r].reshape(B, 1, 1)
            base = base + (y - low)
            coefs.append(hl - 2 * y)

        old_lo = lo_ref[:].astype(jnp.int32)
        old_hi = hi_ref[:].astype(jnp.int32)
        cands = {}
        decs = {}
        for b in (0, 1):
            pen_lo = jnp.broadcast_to(base, (B, PACK, Lb))
            pen_hi = jnp.broadcast_to(base, (B, PACK, Lb))
            for r, (p, inv) in enumerate(zip(code.abs_polys(), code.inversions())):
                c_hi_bit = (p >> (K - 1)) & 1
                base_bits = (b & p & 1) ^ (1 if inv else 0)
                e_lo = pars[r] ^ base_bits
                e_hi = pars[r] ^ (base_bits ^ c_hi_bit)
                pen_lo = pen_lo + e_lo * coefs[r]
                pen_hi = pen_hi + e_hi * coefs[r]
            c_lo = old_lo + pen_lo
            c_hi = old_hi + pen_hi
            d = c_hi < c_lo  # ties keep the low predecessor
            cands[b] = jnp.where(d, c_hi, c_lo).astype(mdt)
            decs[b] = d.astype(jnp.int32)

        # Successor of s2 = 32c+g with input bit b is 64c + 2g + b:
        #   output column 2c + (g >= 16), row (2g + b) % 32.
        # Even output columns take g in [0, 16), odd take g in [16, 32);
        # rows interleave cand_0/cand_1 -- a sublane interleave.
        def scatter(x0, x1):
            top = jnp.stack([x0[:, :16], x1[:, :16]], axis=2).reshape(-1, PACK, Lb)
            bot = jnp.stack([x0[:, 16:], x1[:, 16:]], axis=2).reshape(-1, PACK, Lb)
            return top, bot  # even cols, odd cols

        me, mo = scatter(cands[0], cands[1])
        de, do = scatter(decs[0], decs[1])
        me_ref[:] = me
        mo_ref[:] = mo

        # Pack each column's 32 sublane decisions into one uint32 word.
        gw = jax.lax.broadcasted_iota(jnp.int32, (1, PACK, 1), 1)
        weights = jax.lax.shift_left(jnp.ones((1, PACK, 1), jnp.int32), gw)
        we_ref[:] = (de * weights).sum(axis=1)
        wo_ref[:] = (do * weights).sum(axis=1)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def acs_update_large(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics: jnp.ndarray,
    symbols: jnp.ndarray,
    interpret: bool = False,
):
    """ACS over a whole frame with HBM-resident metrics.

    Args:
      metrics: ``[B, S]`` int32.
      symbols: ``[B, T, R]`` int32.

    Returns ``(metrics [B, S] int32, words [B, T, W] uint32, offset [B]
    int32)`` with the same state-indexed decision packing as the other paths;
    ``offset`` is the amount removed from every metric by the block-entry
    renormalisation (add it back for the true accumulated path error).
    """
    B, S = metrics.shape
    metrics, entry_shift = _shift_to_zero(metrics)
    _, T, R = symbols.shape
    blk = pick_state_block(code)
    NB = S // blk
    assert NB * blk == S
    C = S // PACK          # lane columns in the full state space
    Lb = blk // (2 * PACK)  # predecessor columns per grid block
    assert NB * Lb == C // 2

    if numeric.metric_dtype != "auto":
        mdt = jnp.dtype(numeric.metric_dtype).type
    else:
        mdt = metric_dtype_for(code, numeric, T)
    kernel = _step_kernel(code, numeric, Lb, mdt)
    m3_shape = jax.ShapeDtypeStruct((B, PACK, C // 2), mdt)
    w_shape = jax.ShapeDtypeStruct((B, C // 2), jnp.int32)
    step_call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((B, PACK, Lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, PACK, Lb), lambda i: (0, 0, i + NB), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, PACK, Lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, PACK, Lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Lb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Lb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[m3_shape, m3_shape, w_shape, w_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def body(m3, sym_t):
        me, mo, we, wo = step_call(m3, m3, sym_t)
        # Column re-interleave (even/odd output columns back to natural
        # order) -- a supported XLA reshape; likewise for the word vectors.
        m_next = jnp.stack([me, mo], axis=-1).reshape(B, PACK, C)
        words = jnp.stack([we, wo], axis=-1).reshape(B, C)
        return m_next, words

    # [B, S] -> [B, 32, S/32] with state s at (g = s % 32, c = s // 32).
    m3 = metrics.reshape(B, C, PACK).transpose(0, 2, 1).astype(mdt)
    m3_final, words = jax.lax.scan(body, m3, symbols.transpose(1, 0, 2))
    m_final = m3_final.astype(jnp.int32).transpose(0, 2, 1).reshape(B, S)
    # words: [T, B, C] int32; word c packs states 32c..32c+31 (bit g) --
    # exactly the standard state-indexed packing of the other paths.
    words_u32 = jax.lax.bitcast_convert_type(words.transpose(1, 0, 2), jnp.uint32)
    return m_final, words_u32, entry_shift
