"""Branch-metric machinery.

The reference builds per-polynomial branch tables of 0/255 bytes once and
re-derives branch metrics per step with XOR-as-conditional-negation on the
VPU-of-its-day (SSE registers, ref: ka9q_libfec_port/viterbi27_sse2.cpp:61-70,
:137-146).  The TPU-native formulation instead observes that the whole frame's
branch metrics are one small matrix product:

    penalty[t, (h, b, s2)] = sum_r (sym[t, r] - low)
                           + sum_r E[(h, b)][r, s2] * (high + low - 2 sym[t, r])

where ``E[(h, b)][r, s2]`` is the expected output bit of polynomial ``r`` for
the transition from predecessor ``s2 + h * S/2`` taking input bit ``b``.  The
second term is a ``[T, R] x [R, 4*S/2]`` matmul -- MXU work -- so branch
metrics for an entire frame (or batch of frames) are produced in one fused op
instead of T scalar loop iterations.

For large-K codes (K=24's 2^23 states, ref: viterbi224_sse2.cpp:14-16) the
materialised table would not fit anywhere useful, so the fused ACS path
recomputes penalties per step from the same E tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CodeSpec, NumericSpec

__all__ = [
    "transition_tables",
    "transition_tables_jnp",
    "rotating_tables_jnp",
    "branch_penalties",
    "penalty_base_and_coef",
]


@functools.lru_cache(maxsize=None)
def transition_tables(code: CodeSpec) -> np.ndarray:
    """``E[h*2 + b, r, s2]`` (uint8, shape ``[4, R, S/2]``): expected output
    bit of polynomial ``r`` for the trellis transition from predecessor state
    ``s2 + h * S/2`` with input bit ``b``.

    New state is ``2*s2 + b``; its two predecessors are ``s2`` (h=0) and
    ``s2 + S/2`` (h=1) -- the butterfly the reference pairs via its low/high
    metric vector groups (ref: ka9q_libfec_port/viterbi27_sse2.cpp:149-158).
    """
    K = code.K
    half = code.num_states // 2
    ebits = code.expected_bits_table()  # [R, 2S] indexed by register value
    s2 = np.arange(half, dtype=np.int64)
    out = np.empty((4, code.R, half), dtype=np.uint8)
    for h in (0, 1):
        for b in (0, 1):
            reg = ((s2 << 1) | b) | (h << (K - 1))
            out[h * 2 + b] = ebits[:, reg]
    return out


def transition_tables_jnp(code: CodeSpec) -> jnp.ndarray:
    """``transition_tables`` computed *on device* from an iota (int32
    ``[4, R, S/2]``).

    Identical values to the NumPy builder, but traced as a handful of
    shift/xor vector ops instead of being embedded as a literal -- for K=24
    the materialised table is 128 MiB of int32, which would otherwise bloat
    the compiled program beyond what the compiler accepts.  Uses the parity
    decomposition ``parity(((s2<<1)|b|(h<<(K-1))) & p)
    = parity(s2 & (p>>1)) ^ (b & p) ^ (h & (p>>(K-1)))``.
    """
    K = code.K
    half = code.num_states // 2
    s2 = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)[:, 0]
    rows = []
    for h in (0, 1):
        for b in (0, 1):
            per_r = []
            for p, inv in zip(code.abs_polys(), code.inversions()):
                x = s2 & (p >> 1)
                for shift in (16, 8, 4, 2, 1):
                    x = x ^ (x >> shift)
                e = (x & 1) ^ ((b & p & 1) ^ (h & (p >> (K - 1)) & 1) ^ (1 if inv else 0))
                per_r.append(e)
            rows.append(jnp.stack(per_r, axis=0))  # [R, S/2]
    return jnp.stack(rows, axis=0)  # [4, R, S/2]


def rotating_tables_jnp(
    code: CodeSpec, phase: int, classes: tuple = (0, 1, 2, 3)
) -> jnp.ndarray:
    """Expected-bit tables for one rotation phase of the in-place (FFT-style
    address rotation) ACS ordering, computed *on device* from an iota (uint8
    ``[len(classes), R, S/2]``, class values ``h*2 + b``).

    Position convention (same as ``ops.pallas.inplace``): at trellis step
    ``t`` the metric of state ``s`` lives at position ``rotr(s, t mod (K-1))``
    within the K-1 state bits.  At phase ``t`` the butterfly pairs positions
    ``(q, q | 2**j)`` with ``j = (K-2-t) mod (K-1)``; compressed pair index
    ``i`` (the pair's rank with bit ``j`` removed) maps to ``q = ((i >> j) <<
    (j+1)) | (i & (2**j - 1))`` and predecessor half-state ``s2 = rotl(q,
    t)``.  Entry ``[h*2+b, r, i]`` is the expected output bit of polynomial
    ``r`` for the transition from ``s2 + h*S/2`` on input bit ``b`` -- i.e.
    ``transition_tables_jnp(code)[h*2+b, r, :]`` permuted into compressed
    phase-``t`` position order.
    """
    K = code.K
    nrot = K - 1
    half = code.num_states // 2
    j = (K - 2 - phase) % nrot
    i = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)[:, 0]
    q = ((i >> j) << (j + 1)) | (i & ((1 << j) - 1))
    mask = (1 << nrot) - 1
    t = phase % nrot
    s2 = ((q << t) | (q >> (nrot - t))) & mask if t else q
    rows = []
    for hb in classes:
        h, b = hb >> 1, hb & 1
        per_r = []
        for p, inv in zip(code.abs_polys(), code.inversions()):
            x = s2 & (p >> 1)
            for shift in (16, 8, 4, 2, 1):
                x = x ^ (x >> shift)
            e = (x & 1) ^ ((b & p & 1) ^ (h & (p >> (K - 1)) & 1) ^ (1 if inv else 0))
            per_r.append(e.astype(jnp.uint8))
        rows.append(jnp.stack(per_r, axis=0))
    return jnp.stack(rows, axis=0)  # [len(classes), R, S/2] uint8


def penalty_base_and_coef(numeric: NumericSpec, symbols: jnp.ndarray):
    """Split symbols ``[..., R]`` int32 into the affine pieces of the branch
    penalty: ``base = sum_r (sym_r - low)`` and ``coef_r = high + low - 2 sym_r``.
    """
    low = jnp.int32(numeric.soft_low)
    hl = jnp.int32(numeric.soft_high + numeric.soft_low)
    base = (symbols - low).sum(axis=-1, dtype=jnp.int32)
    coef = hl - 2 * symbols
    return base, coef


@functools.partial(jnp.vectorize, excluded=(0, 1), signature="(t,r)->(t,x,s)")
def _branch_penalties_impl(code, numeric, symbols):
    tables = transition_tables_jnp(code)  # [4, R, S/2] int32, on device
    base, coef = penalty_base_and_coef(numeric, symbols)  # [T], [T, R]
    half = code.num_states // 2
    e_mat = tables.transpose(1, 0, 2).reshape(code.R, 4 * half)
    pen = jnp.dot(coef, e_mat, preferred_element_type=jnp.int32)
    return base[:, None, None] + pen.reshape(-1, 4, half)


def branch_penalties(
    code: CodeSpec, numeric: NumericSpec, symbols: jnp.ndarray
) -> jnp.ndarray:
    """Branch penalties ``[..., T, 4, S/2]`` int32 for symbols ``[..., T, R]``.

    Index 1 of the middle axis is ``h*2 + b`` matching ``transition_tables``.
    Only sensible for codes whose table fits comfortably (K <= 15); the K=24
    path computes penalties inside its state-streaming kernel.
    """
    return _branch_penalties_impl(code, numeric, symbols.astype(jnp.int32))
