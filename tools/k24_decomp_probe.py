#!/usr/bin/env python
"""Decompose the K=24 pair-kernel time: pallas kernel vs XLA re-interleave.

RESULTS/ARCHITECTURE attribute the K=24 update's 12-20 %-of-roofline gap to
"HBM bw + XLA re-interleave copies + per-pair overheads" (penalty compute
ruled out by tools/k24_sweep.py; batch scaling flat).  This probe separates
the remaining suspects by timing, at the benchmark batch:

  full       -- acs_update_large2's real scan (kernel + stack/reshape
                re-interleave per pair), the shipped path;
  kernel     -- the same pallas pair-kernel in a scan that carries the four
                mod-4 column-residue outputs straight back as four separate
                inputs (no re-interleave anywhere).  The decode would be
                wrong (columns permute per pair) but every DMA/compute shape
                is identical, so the time is the kernel+launch floor;
  interleave -- a scan whose body is ONLY the stack/reshape + re-split of
                the same-sized metric tensor (XLA elementwise round trip).

full - kernel ~= interleave confirms the re-interleave is the gap; then the
fix candidates are (a) fusing more steps per launch (depth 4: one
re-interleave per 4 steps) and (b) moving the merge in-kernel.

Run: python tools/k24_decomp_probe.py [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k, large_k2

LOG = lambda *a: print(*a, flush=True)
code = VITERBI224
numeric = soft8_spec(code.R)
PACK = large_k2.PACK
S = code.num_states
C = S // PACK
blk = large_k.pick_state_block(code)
NB = S // blk
Lb4 = blk // (4 * PACK)
rng = np.random.default_rng(0)


def readback(x):
    np.asarray(jax.tree.leaves(x)[0][..., -1:])


def t_once(fn, *a):
    t0 = time.perf_counter()
    readback(fn(*a))
    return time.perf_counter() - t0


def marginal(short, long, args_s, args_l, pairs=15, iters=7):
    readback(short(*args_s)), readback(long(*args_l))  # compile
    ms = []
    for _ in range(iters):
        ts = min(t_once(short, *args_s), t_once(short, *args_s))
        tl = min(t_once(long, *args_l), t_once(long, *args_l))
        ms.append(max((tl - ts) / pairs, 1e-9))
    return float(np.median(ms))


def make_full(B, T2):
    syms = jnp.asarray(rng.integers(0, 7, size=(B, 2 * T2, code.R)), jnp.int32)
    m0 = jnp.zeros((B, S), jnp.int32)
    f = jax.jit(lambda m, s: large_k2.acs_update_large2.__wrapped__(
        code, numeric, m, s, False, "int16", True)[0])
    return f, (m0, syms)


def make_kernel_only(B, T2, mdt=jnp.int16):
    """The pair kernel scanned with residue outputs fed straight back."""
    use_tables = large_k2.flags.lk2_tables()
    kernel = large_k2._pair_kernel(code, numeric, Lb4, NB, mdt, use_tables,
                                   False, True)
    m_shape = jax.ShapeDtypeStruct((B, PACK, C // 4), mdt)
    w_shape = jax.ShapeDtypeStruct((B, C // 4), jnp.int32)
    in_spec_sep = pl.BlockSpec((B, PACK, Lb4), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((B, PACK, Lb4), lambda j: (0, 0, j),
                        memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((B, Lb4), lambda j: (0, j), memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((B, 2 * code.R), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [in_spec_sep] * 4 + [sym_spec]
    table_args = ()
    if use_tables:
        t0_np, t1_np = large_k2._par_tables_np(code)
        tspec = lambda off: pl.BlockSpec(
            (PACK, Lb4), lambda j, off=off: (0, j + off),
            memory_space=pltpu.VMEM)
        in_specs += [tspec(0), tspec(NB), tspec(0), tspec(0)]
        t0 = jnp.asarray(t0_np)
        table_args = (t0, t0, jnp.asarray(t1_np[0]), jnp.asarray(t1_np[1]))
    call = pl.pallas_call(
        kernel, grid=(NB,), in_specs=in_specs,
        out_specs=[out3] * 4 + [out2] * 12,
        out_shape=[m_shape] * 4 + [w_shape] * 12,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    syms = jnp.asarray(
        rng.integers(0, 7, size=(T2, B, 2 * code.R)), jnp.int32)
    m0 = tuple(jnp.zeros((B, PACK, C // 4), mdt) for _ in range(4))

    @jax.jit
    def run(m4, sym_pairs):
        def body(m4, sym):
            m0_, m1, m2, m3, *ws = call(*m4, sym, *table_args)
            return (m0_, m1, m2, m3), ws[4]  # keep one word stream live

        return jax.lax.scan(body, m4, sym_pairs)

    return run, (m0, syms)


def make_interleave_only(B, T2, mdt=jnp.int16):
    """Scan body = the stack/reshape merge + the re-split, nothing else."""
    m0 = tuple(jnp.zeros((B, PACK, C // 4), mdt) for _ in range(4))
    dummy = jnp.arange(T2, dtype=jnp.int32)

    @jax.jit
    def run(m4, ts):
        def body(m4, t):
            m = jnp.stack(list(m4), axis=-1).reshape(B, PACK, C)
            m = m + t.astype(mdt)  # defeat CSE across iterations
            return tuple(m[:, :, o::4] for o in range(4)), ()

        return jax.lax.scan(body, m4, ts)[0]

    return run, (m0, dummy)


if __name__ == "__main__":
    batches = [int(b) for b in (sys.argv[1:] or ["4", "16"])]
    LOG(f"platform={jax.devices()[0].platform} NB={NB} Lb4={Lb4}")
    for B in batches:
        rows = {}
        for name, mk in (("full", make_full), ("kernel", make_kernel_only),
                         ("interleave", make_interleave_only)):
            fs, args_s = mk(B, 2)
            fl, args_l = mk(B, 17)
            m = marginal(fs, fl, args_s, args_l, pairs=15)
            rows[name] = m
            LOG(f"B={B} {name:10s}: {m*1e3:8.2f} ms/pair "
                f"({B * 4 / m / 1e3:7.2f} ksym/s)")
        LOG(f"B={B} kernel+interleave = {1e3*(rows['kernel']+rows['interleave']):.2f} "
            f"ms vs full {1e3*rows['full']:.2f} ms")
    LOG("ALL DONE")
