#!/usr/bin/env python
"""K=24 chainback probe: scalar-DMA walk vs the jnp gather walk.

The jnp traceback for K=24 reads a [B, W=256Ki] uint32 slice per step --
~1 MiB x B per trellis step streamed from HBM for 4 touched bytes
(ref analogue reads exactly one 32-bit word per step,
viterbi224_sse2.cpp:93-105).  This probe implements the walk as a Pallas
kernel whose decision array stays in HBM (memory_space ANY) and issues one
4-byte async copy per (frame, step) at the data-dependent word index --
the TPU translation of the reference's random-access chainback loads.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors

LOG = lambda *a: print(*a, flush=True)


def _walk_kernel(K: int, T: int, B: int):
    def kernel(end_ref, dec_ref, bits_ref, state_scr, word_scr, sems):
        # end_ref: SMEM [B]; dec_ref: ANY [B, T, W] int32 (stays in HBM);
        # bits_ref: SMEM [T, B] int32 output; state_scr: SMEM [B];
        # word_scr: VMEM [B, 1]; sems: DMA sem array [B].
        for b in range(B):
            state_scr[b] = end_ref[b]

        def step(j, _):
            t = T - 1 - j
            for b in range(B):
                s = state_scr[b]
                pltpu.make_async_copy(
                    dec_ref.at[b, t, pl.ds(s >> 5, 1)],
                    word_scr.at[b],
                    sems.at[b],
                ).start()
            for b in range(B):
                pltpu.make_async_copy(
                    dec_ref.at[b, t, pl.ds(state_scr[b] >> 5, 1)],
                    word_scr.at[b],
                    sems.at[b],
                ).wait()
            for b in range(B):
                s = state_scr[b]
                word = word_scr[b, 0]
                k = jax.lax.shift_right_logical(word, s & 31) & 1
                state_scr[b] = jax.lax.shift_right_logical(s, 1) | (k << (K - 2))
                bits_ref[t, b] = k
            return 0

        jax.lax.fori_loop(0, T, step, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3))
def dma_walk(code, words, endstate, interpret=False):
    """words: [B, T, W] uint32 -> bits [T, B] int32 (walk output)."""
    B, T, W = words.shape
    kernel = _walk_kernel(code.K, T, B)
    bits = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((B,), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((B,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(endstate.astype(jnp.int32), jax.lax.bitcast_convert_type(words, jnp.int32))
    return bits


def run(B=4, nb=8, iters=5):
    code = VITERBI224
    numeric = soft8_spec(code.R)
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    T = syms.shape[1]

    m0 = acs.init_metrics(code, numeric, B)
    t0 = time.time()
    _, words, _ = jax.block_until_ready(
        large_k2.acs_update_large2(code, numeric, m0, syms))
    LOG(f"B={B}: update done in {time.time()-t0:.0f}s; words {words.shape}")

    def marginal_chain(one_fn, n_chain=9):
        """In-jit chain with data-dependent links (endstate from previous
        output) vs 1 link; marginal cancels the rig's ~60-80 ms dispatch."""
        def make(n):
            @jax.jit
            def runner(w):
                out = one_fn(w, jnp.int32(0))
                for _ in range(n - 1):
                    out = one_fn(w, out.reshape(-1)[-1].astype(jnp.int32))
                return out
            return runner
        c1, cn = make(1), make(n_chain)
        jax.block_until_ready(c1(words)); jax.block_until_ready(cn(words))
        margs = []
        for _ in range(iters):
            def timed(fn):
                t0 = time.perf_counter()
                r = fn(words)
                np.asarray(r.reshape(-1)[-1])
                return time.perf_counter() - t0
            t1 = min(timed(c1), timed(c1))
            tn = timed(cn)
            margs.append(max((tn - t1) / (n_chain - 1), 1e-9))
        return float(np.median(margs)), float(np.std(margs))

    # Reference output via the jnp walk
    out_ref = jax.block_until_ready(cb.chainback(code, words, nb * 8))
    errs0 = count_bit_errors(np.asarray(out_ref), data)
    t_jnp, sd = marginal_chain(lambda w, es: cb.chainback(code, w, nb * 8, es))
    LOG(f"B={B} jnp walk: {t_jnp*1e3:.2f}+-{sd*1e3:.2f} ms -> "
        f"{B*nb*8/t_jnp/1e6:.2f} Mbit/s (errors {errs0})")

    # Scalar-DMA walk
    try:
        end0 = jnp.zeros((B,), dtype=jnp.int32)
        t0 = time.time()
        bits = jax.block_until_ready(dma_walk(code, words, end0))
        LOG(f"B={B} dma walk compiled in {time.time()-t0:.0f}s")
        from ka9q_viterbi_comparison_tpu.utils.bits import bits_to_bytes
        walked = bits_to_bytes(
            jnp.asarray(bits).T.astype(jnp.uint8)[:, code.K - 1 : code.K - 1 + nb * 8])
        errs = count_bit_errors(np.asarray(walked), data)
        t_dma, sd = marginal_chain(
            lambda w, es: dma_walk(code, w, jnp.full((B,), es, jnp.int32)))
        LOG(f"B={B} dma walk: {t_dma*1e3:.2f}+-{sd*1e3:.2f} ms -> "
            f"{B*nb*8/t_dma/1e6:.2f} Mbit/s (errors {errs})")
    except Exception as e:  # noqa: BLE001
        LOG(f"B={B} dma walk FAIL: {str(e).splitlines()[0][:300]}")


if __name__ == "__main__":
    LOG(f"backend: {jax.default_backend()}")
    run(B=4)
    run(B=16)
    LOG("ALL DONE")
