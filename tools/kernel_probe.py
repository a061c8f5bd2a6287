#!/usr/bin/env python
"""A/B probe of ACS kernel variants to locate the per-step cost on hardware.

Honest timing: every measurement fetches one output element to host.
Variants (all same shapes, only the step body changes):

  full        -- the production kernel path (dispatch.phase_fns update)
  jnp         -- the lax.scan fused-penalty path
  noNothing   -- pallas kernel stripped to metric add only (loop/IO floor)
  noInter     -- butterfly without the sublane interleave (wrong results)
  noPack      -- butterfly + interleave, decisions written unpacked (2x HBM)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops import acs  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.branch import transition_tables_jnp  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.pallas import dispatch  # noqa: E402

LOG = lambda *a: print(*a, flush=True)
B = 1024
NBYTES = 1024
code, numeric = VITERBI27, soft8_spec(2)
S, S2, R = 64, 32, 2
TB = 512


def timed(fn, *args, iters=3):
    out = fn(*args)
    for leaf in jax.tree.leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(leaf.ravel()[-1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree.leaves(out):
            if isinstance(leaf, jax.Array):
                np.asarray(leaf.ravel()[-1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_variant(mode, raw=False):
    low = numeric.soft_low
    hl = numeric.soft_high + numeric.soft_low

    def kernel(e_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            m_scr[:] = m_in_ref[:]

        def step(t, _):
            sym = sym_ref[t]
            m = m_scr[:]
            if mode == "noNothing":
                m_scr[:] = m + sym[0, 0]
                dec_ref[t] = m[:2].astype(jnp.int32)
                return 0
            base = (sym[0:1] - low) + (sym[1:2] - low)
            pens = []
            for x in range(4):
                p = base
                for r in range(R):
                    e = e_ref[:, x * R + r : x * R + r + 1]
                    p = p + e * (hl - 2 * sym[r : r + 1])
                pens.append(p)
            mlo = m[:S2]
            mhi = m[S2:]
            cands, decs = [], []
            for b in (0, 1):
                c_lo = mlo + pens[b]
                c_hi = mhi + pens[2 + b]
                d = c_hi < c_lo
                cands.append(jnp.where(d, c_hi, c_lo))
                decs.append(d.astype(jnp.int32))
            if mode == "noInter":
                new = jnp.concatenate(cands, axis=0)
                dec = jnp.concatenate(decs, axis=0)
            else:
                new = jnp.stack(cands, axis=1).reshape(S, B)
                dec = jnp.stack(decs, axis=1).reshape(S, B)
            m_scr[:] = new
            if mode == "noPack":
                dec_ref[t] = dec[:2]
            else:
                j = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
                w = jax.lax.shift_left(jnp.ones((1, 32, 1), jnp.int32), j)
                dec_ref[t] = (dec.reshape(2, 32, B) * w).sum(axis=1)
            return 0

        jax.lax.fori_loop(0, TB, step, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            m_out_ref[:] = m_scr[:]

    def raw_call(e_in, syms, m0):
        Tp = syms.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(Tp // TB,),
            in_specs=[
                pl.BlockSpec((S2, 4 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, R, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 2, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S, B), jnp.int32),
                jax.ShapeDtypeStruct((Tp, 2, B), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((S, B), jnp.int32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",), vmem_limit_bytes=min(110*1024*1024, max(64, (3*S*B + 3*TB*(R+2)*B)*4*2)*1024 if False else 110*1024*1024)),
        )(e_in, syms, m0)

    if raw:
        return raw_call
    return jax.jit(raw_call)


def make_chunked(CH=16, raw=False):
    """Chunked time loop: one dynamic [CH, R, B] symbol read and one
    [CH, W, B] decision write per CH steps; the CH steps in between are
    fully unrolled on register values (static indexing only), with the
    metric vector carried as a fori value, and the e-table pre-broadcast
    to [S2, B] masks once per grid block."""
    low = numeric.soft_low
    hl = numeric.soft_high + numeric.soft_low

    def kernel(e_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            m_scr[:] = m_in_ref[:]

        # Loop-invariant: e columns broadcast across lanes once.
        ones = jnp.ones((1, B), dtype=jnp.int32)
        e_masks = [[e_ref[:, x * R + r : x * R + r + 1] * ones for r in range(R)]
                   for x in range(4)]

        def chunk(c, m):
            syms = sym_ref[pl.ds(c * CH, CH)]  # [CH, R, B]
            outs = []
            for j in range(CH):
                base = (syms[j, 0:1] - low) + (syms[j, 1:2] - low)
                pens = []
                for x in range(4):
                    p = base
                    for r in range(R):
                        p = p + e_masks[x][r] * (hl - 2 * syms[j, r : r + 1])
                    pens.append(p)
                mlo = m[:S2]
                mhi = m[S2:]
                cands, decs = [], []
                for b in (0, 1):
                    c_lo = mlo + pens[b]
                    c_hi = mhi + pens[2 + b]
                    d = c_hi < c_lo
                    cands.append(jnp.where(d, c_hi, c_lo))
                    decs.append(d.astype(jnp.int32))
                m = jnp.stack(cands, axis=1).reshape(S, B)
                dec = jnp.stack(decs, axis=1).reshape(S, B)
                jj = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
                w = jax.lax.shift_left(jnp.ones((1, 32, 1), jnp.int32), jj)
                outs.append((dec.reshape(2, 32, B) * w).sum(axis=1))
            dec_ref[pl.ds(c * CH, CH)] = jnp.stack(outs, axis=0)
            return m

        m = jax.lax.fori_loop(0, TB // CH, chunk, m_scr[:])
        m_scr[:] = m

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            m_out_ref[:] = m

    def raw_call(e_in, syms, m0):
        Tp = syms.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(Tp // TB,),
            in_specs=[
                pl.BlockSpec((S2, 4 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, R, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 2, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S, B), jnp.int32),
                jax.ShapeDtypeStruct((Tp, 2, B), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((S, B), jnp.int32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",), vmem_limit_bytes=min(110*1024*1024, max(64, (3*S*B + 3*TB*(R+2)*B)*4*2)*1024 if False else 110*1024*1024)),
        )(e_in, syms, m0)

    if raw:
        return raw_call
    return jax.jit(raw_call)


def make_gridstep():
    """One grid step per trellis step: no dynamic in-kernel indexing; the
    Pallas pipeline streams [1, R, B] symbol rows and [1, W, B] decision rows."""
    low = numeric.soft_low
    hl = numeric.soft_high + numeric.soft_low

    def kernel(e_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            m_scr[:] = m_in_ref[:]

        sym = sym_ref[0]
        m = m_scr[:]
        base = (sym[0:1] - low) + (sym[1:2] - low)
        pens = []
        for x in range(4):
            p = base
            for r in range(R):
                e = e_ref[:, x * R + r : x * R + r + 1]
                p = p + e * (hl - 2 * sym[r : r + 1])
            pens.append(p)
        mlo = m[:S2]
        mhi = m[S2:]
        cands, decs = [], []
        for b in (0, 1):
            c_lo = mlo + pens[b]
            c_hi = mhi + pens[2 + b]
            d = c_hi < c_lo
            cands.append(jnp.where(d, c_hi, c_lo))
            decs.append(d.astype(jnp.int32))
        new = jnp.stack(cands, axis=1).reshape(S, B)
        dec = jnp.stack(decs, axis=1).reshape(S, B)
        m_scr[:] = new
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
        w = jax.lax.shift_left(jnp.ones((1, 32, 1), jnp.int32), j)
        dec_ref[0] = (dec.reshape(2, 32, B) * w).sum(axis=1)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            m_out_ref[:] = m_scr[:]

    @jax.jit
    def run(e_in, syms, m0):
        Tp = syms.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(Tp,),
            in_specs=[
                pl.BlockSpec((S2, 4 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S, B), jnp.int32),
                jax.ShapeDtypeStruct((Tp, 2, B), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((S, B), jnp.int32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",), vmem_limit_bytes=min(110*1024*1024, max(64, (3*S*B + 3*TB*(R+2)*B)*4*2)*1024 if False else 110*1024*1024)),
        )(e_in, syms, m0)

    return run


def run_for_batch():
    global syms_jnp
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, NBYTES), dtype=np.uint8)
    syms = jax.block_until_ready(
        encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, 2))
    syms_jnp = syms
    T = syms.shape[1]
    Tp = -(-T // TB) * TB
    sym_trb = jnp.pad(syms, ((0, 0), (0, Tp - T), (0, 0))).transpose(1, 2, 0)
    sym_trb = jax.block_until_ready(sym_trb)
    n_sym = B * T * R

    e_in = jax.block_until_ready(
        transition_tables_jnp(code).transpose(2, 0, 1).reshape(S2, 4 * R))
    m0 = jnp.zeros((S, B), jnp.int32)


    # Marginal timing: chain N dependent kernel calls inside one jit; the
    # per-call host-fetch overhead cancels in the difference.
    def chain(n, base):
        @jax.jit
        def run_n(e_in, syms, m0):
            m = m0
            dec = None
            for _ in range(n):
                m, dec = base(e_in, syms, m)
            return m, dec
        return run_n

    def marginal(label, base):
        t1 = timed(chain(1, base), e_in, sym_trb, m0)
        t5 = timed(chain(5, base), e_in, sym_trb, m0)
        marg = (t5 - t1) / 4
        LOG(f"B={B} {label:>10}: {marg*1e3:8.2f} ms  {n_sym/marg/1e9:7.2f} Gsym/s  "
            f"({marg/Tp*1e6:.2f} us/step)  [t1={t1*1e3:.1f}ms]")

    marginal("full", make_variant("full", raw=True))
    marginal("escratch", make_escratch(raw=True))




def make_escratch(raw=False):
    """e-table pre-broadcast into persistent VMEM scratch at grid step 0;
    per-step penalties read [S2, B] masks directly (no lane broadcasts in
    the hot loop)."""
    low = numeric.soft_low
    hl = numeric.soft_high + numeric.soft_low

    def kernel(e_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr, e_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            m_scr[:] = m_in_ref[:]
            ones = jnp.ones((1, B), dtype=jnp.int32)
            for x in range(4):
                for r in range(R):
                    e_scr[x * R + r] = e_ref[:, x * R + r : x * R + r + 1] * ones

        def step(t, _):
            sym = sym_ref[t]
            m = m_scr[:]
            base = (sym[0:1] - low) + (sym[1:2] - low)
            pens = []
            for x in range(4):
                p = base
                for r in range(R):
                    p = p + e_scr[x * R + r] * (hl - 2 * sym[r : r + 1])
                pens.append(p)
            mlo = m[:S2]
            mhi = m[S2:]
            cands, decs = [], []
            for b in (0, 1):
                c_lo = mlo + pens[b]
                c_hi = mhi + pens[2 + b]
                d = c_hi < c_lo
                cands.append(jnp.where(d, c_hi, c_lo))
                decs.append(d.astype(jnp.int32))
            new = jnp.stack(cands, axis=1).reshape(S, B)
            dec = jnp.stack(decs, axis=1).reshape(S, B)
            m_scr[:] = new
            j = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
            w = jax.lax.shift_left(jnp.ones((1, 32, 1), jnp.int32), j)
            dec_ref[t] = (dec.reshape(2, 32, B) * w).sum(axis=1)
            return 0

        jax.lax.fori_loop(0, TB, step, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            m_out_ref[:] = m_scr[:]

    def raw_call(e_in, syms, m0):
        Tp = syms.shape[0]
        vlim = min((3 * S * B + 2 * TB * (R + 2) * B + 4 * R * S2 * B) * 4 * 3, 110 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            grid=(Tp // TB,),
            in_specs=[
                pl.BlockSpec((S2, 4 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, R, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 2, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S, B), jnp.int32),
                jax.ShapeDtypeStruct((Tp, 2, B), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((S, B), jnp.int32),
                            pltpu.VMEM((4 * R, S2, B), jnp.int32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",), vmem_limit_bytes=vlim),
        )(e_in, syms, m0)

    if raw:
        return raw_call
    return jax.jit(raw_call)

def main():
    global B
    for B in (1024, 4096, 8192):
        run_for_batch()


if __name__ == "__main__":
    main()
