"""State-blocked ACS kernel for very large trellises (K=24 "ICE").

The K<=15 kernels keep the whole metric vector VMEM-resident; K=24's 2^23
states x int32 = 32 MiB per buffer (the reference burns 2 x 16 MiB of heap
and streams it through SSE registers, ref: viterbi224_sse2.cpp:14-16), so
here the metric vectors live in HBM and each trellis step is one
``pallas_call`` whose grid tiles the *state* axis:

* grid block i reads predecessor slices ``old[i*blk/2 : (i+1)*blk/2]`` (low
  half) and the mirrored high-half slice -- the same array is passed twice
  with two BlockSpec index maps, so Pallas's pipeline streams both butterfly
  inputs HBM->VMEM double-buffered;
* expected bits are computed in-kernel from a lane iota + parity fold
  (identity: ``parity(((s2<<1)|b|(h<<(K-1))) & p) = parity(s2 & (p>>1))
  ^ (b & p) ^ (h & p>>(K-1))``) -- the materialised branch table would be
  64 MiB (ref: viterbi224_sse2.cpp:16-20);
* outputs are the four butterfly result vectors as CONTIGUOUS half-arrays
  (new-even metrics, new-odd metrics, and their decision vectors): Mosaic
  cannot lane-interleave 2^16-lane vectors, so the even/odd interleave into
  natural state order -- and the 32-bit decision-word packing -- happen in
  XLA between steps, where they are plain (well-supported) reshapes;
* the time loop is a ``lax.scan`` at the XLA level: one kernel launch per
  input bit, amortised by the ~100 MiB the butterfly moves per step.

Layout is batch-major ``[B, S]`` (B on sublanes, states on lanes): for K=24
the batch is small and the state axis is what must saturate the vector unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import CodeSpec, NumericSpec

__all__ = ["acs_update_large", "pick_state_block"]

MAX_BLOCK = 1 << 17  # states per grid block (0.5 MiB of int32 lanes per row)


def pick_state_block(code: CodeSpec) -> int:
    return min(code.num_states, MAX_BLOCK)


def _parity_fold(x: jnp.ndarray) -> jnp.ndarray:
    for shift in (16, 8, 4, 2, 1):
        x = x ^ (x >> shift)
    return x & 1


def _step_kernel(code: CodeSpec, numeric: NumericSpec, blk: int):
    K, R = code.K, code.R
    low = numeric.soft_low
    high = numeric.soft_high
    half = blk // 2

    def kernel(lo_ref, hi_ref, sym_ref, ne_ref, no_ref, de_ref, do_ref):
        # lo/hi: [B, blk/2] predecessor metrics; sym: [B, R] int32;
        # ne/no: new metrics for even (b=0) / odd (b=1) successor states;
        # de/do: decision vectors (0 = low predecessor won), same shapes.
        i = pl.program_id(0)
        B = lo_ref.shape[0]
        s2 = jax.lax.broadcasted_iota(jnp.int32, (1, half), 1) + i * half

        # parity(s2 & (p >> 1)) per polynomial [1, half], shared across (h, b);
        # per-frame symbol pieces broadcast along sublanes:
        # pen = sum_r (y_r - low) + e_r * (high + low - 2 y_r).
        pars = [_parity_fold(s2 & (p >> 1)) for p in code.abs_polys()]
        hl = high + low
        base = jnp.zeros((B, 1), dtype=jnp.int32)
        coefs = []
        for r in range(R):
            y = sym_ref[:, r : r + 1]  # [B, 1]
            base = base + (y - low)
            coefs.append(hl - 2 * y)

        old_lo = lo_ref[:]
        old_hi = hi_ref[:]
        outs = {0: (ne_ref, de_ref), 1: (no_ref, do_ref)}
        for b in (0, 1):
            pen_lo = jnp.broadcast_to(base, (B, half))
            pen_hi = jnp.broadcast_to(base, (B, half))
            for r, (p, inv) in enumerate(zip(code.abs_polys(), code.inversions())):
                c_hi_bit = (p >> (K - 1)) & 1
                base_bits = (b & p & 1) ^ (1 if inv else 0)
                e_lo = pars[r] ^ base_bits          # [1, half] 0/1
                e_hi = pars[r] ^ base_bits ^ c_hi_bit
                pen_lo = pen_lo + e_lo * coefs[r]
                pen_hi = pen_hi + e_hi * coefs[r]
            c_lo = old_lo + pen_lo
            c_hi = old_hi + pen_hi
            d = c_hi < c_lo  # ties keep the low predecessor
            m_ref, d_ref = outs[b]
            m_ref[:] = jnp.where(d, c_hi, c_lo)
            d_ref[:] = d.astype(jnp.int32)

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

    Returns ``(metrics [B, S] int32, words [B, T, W] uint32)`` with the same
    state-indexed decision packing as the other paths.
    """
    B, S = metrics.shape
    _, T, R = symbols.shape
    blk = pick_state_block(code)
    NB = S // blk
    assert NB * blk == S
    half = blk // 2

    kernel = _step_kernel(code, numeric, blk)
    half_shape = jax.ShapeDtypeStruct((B, S // 2), jnp.int32)
    step_call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((B, half), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda i: (0, i + NB), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, half), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[half_shape, half_shape, half_shape, half_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    weights = jax.lax.shift_left(
        jnp.ones((1, 1, 32), jnp.int32), jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2)
    )

    def body(m, sym_t):
        ne, no, de, do = step_call(m, m, sym_t)
        # Interleave even/odd halves back to natural state order and pack
        # decision words -- plain XLA reshapes (Mosaic can't lane-interleave
        # 2^16-lane vectors in-kernel).
        new = jnp.stack([ne, no], axis=-1).reshape(B, S)
        dec = jnp.stack([de, do], axis=-1).reshape(B, S)
        words = (dec.reshape(B, S // 32, 32) * weights).sum(axis=-1)
        return new, words

    m_final, words = jax.lax.scan(body, metrics, symbols.transpose(1, 0, 2))
    # words: [T, B, S//32] int32 -> [B, T, W] uint32
    return m_final, jax.lax.bitcast_convert_type(words.transpose(1, 0, 2), jnp.uint32)
