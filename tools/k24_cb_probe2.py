#!/usr/bin/env python
"""Bisect the K=24 scalar-DMA walk kernel: which construct kills Mosaic.

t0: SMEM-only kernel (scalar loop, SMEM out, no DMA)
t1: + one async copy HBM->VMEM with static indices
t2: + VMEM scalar read of the copied word
t3: + dynamic time index from fori induction var
t4: + dynamic word index from an SMEM-held state (the full pattern)
t5: full walk (per-frame chained state)
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

LOG = lambda *a: print(*a, flush=True)
B, T, W, K = 4, 87, 1 << 18, 24


def try_case(name, kernel, out_shape, scratch, n_in=2):
    ins = [jnp.zeros((B,), jnp.int32), jnp.ones((B, T, W), jnp.int32)][:n_in]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)][:n_in]
    try:
        t0 = time.time()
        out = pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
        )(*ins)
        jax.block_until_ready(out)
        LOG(f"{name}: OK ({time.time()-t0:.0f}s) sample={np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:  # noqa: BLE001
        LOG(f"{name}: FAIL {str(e).splitlines()[0][:200]}")
        return False


def main():
    out_tb = jax.ShapeDtypeStruct((T, B), jnp.int32)

    def k0(end_ref, out_ref, state_scr):
        for b in range(B):
            state_scr[b] = end_ref[b]

        def step(j, _):
            t = T - 1 - j
            for b in range(B):
                out_ref[t, b] = state_scr[b] + t
            return 0

        jax.lax.fori_loop(0, T, step, 0)

    try_case("t0_smem_loop", k0, out_tb,
             [pltpu.SMEM((B,), jnp.int32)], n_in=1)

    def k1(end_ref, dec_ref, out_ref, state_scr, word_scr, sem):
        for b in range(B):
            state_scr[b] = end_ref[b]
        pltpu.make_async_copy(dec_ref.at[0, 0, pl.ds(0, 1)], word_scr.at[0], sem).start()
        pltpu.make_async_copy(dec_ref.at[0, 0, pl.ds(0, 1)], word_scr.at[0], sem).wait()

        def step(j, _):
            t = T - 1 - j
            for b in range(B):
                out_ref[t, b] = state_scr[b]
            return 0

        jax.lax.fori_loop(0, T, step, 0)

    try_case("t1_static_dma", k1, out_tb,
             [pltpu.SMEM((B,), jnp.int32), pltpu.VMEM((B, 1), jnp.int32),
              pltpu.SemaphoreType.DMA])

    def k2(end_ref, dec_ref, out_ref, state_scr, word_scr, sem):
        pltpu.make_async_copy(dec_ref.at[0, 0, pl.ds(0, 1)], word_scr.at[0], sem).start()
        pltpu.make_async_copy(dec_ref.at[0, 0, pl.ds(0, 1)], word_scr.at[0], sem).wait()
        w = word_scr[0, 0]

        def step(j, _):
            t = T - 1 - j
            for b in range(B):
                out_ref[t, b] = w
            return 0

        jax.lax.fori_loop(0, T, step, 0)

    try_case("t2_vmem_scalar_read", k2, out_tb,
             [pltpu.SMEM((B,), jnp.int32), pltpu.VMEM((B, 1), jnp.int32),
              pltpu.SemaphoreType.DMA])

    def k3(end_ref, dec_ref, out_ref, state_scr, word_scr, sem):
        def step(j, _):
            t = T - 1 - j
            pltpu.make_async_copy(dec_ref.at[0, t, pl.ds(0, 1)], word_scr.at[0], sem).start()
            pltpu.make_async_copy(dec_ref.at[0, t, pl.ds(0, 1)], word_scr.at[0], sem).wait()
            for b in range(B):
                out_ref[t, b] = word_scr[0, 0]
            return 0

        jax.lax.fori_loop(0, T, step, 0)

    try_case("t3_dyn_t_dma", k3, out_tb,
             [pltpu.SMEM((B,), jnp.int32), pltpu.VMEM((B, 1), jnp.int32),
              pltpu.SemaphoreType.DMA])

    def k4(end_ref, dec_ref, out_ref, state_scr, word_scr, sem):
        for b in range(B):
            state_scr[b] = end_ref[b]

        def step(j, _):
            t = T - 1 - j
            s = state_scr[0]
            pltpu.make_async_copy(
                dec_ref.at[0, t, pl.ds(s >> 5, 1)], word_scr.at[0], sem).start()
            pltpu.make_async_copy(
                dec_ref.at[0, t, pl.ds(s >> 5, 1)], word_scr.at[0], sem).wait()
            word = word_scr[0, 0]
            k = jax.lax.shift_right_logical(word, s & 31) & 1
            state_scr[0] = jax.lax.shift_right_logical(s, 1) | (k << (K - 2))
            out_ref[t, 0] = k
            for b in range(1, B):
                out_ref[t, b] = 0
            return 0

        jax.lax.fori_loop(0, T, step, 0)

    try_case("t4_dyn_word_dma", k4, out_tb,
             [pltpu.SMEM((B,), jnp.int32), pltpu.VMEM((B, 1), jnp.int32),
              pltpu.SemaphoreType.DMA])

    def k5(end_ref, dec_ref, out_ref, state_scr, word_scr, sems):
        for b in range(B):
            state_scr[b] = end_ref[b]

        def step(j, _):
            t = T - 1 - j
            for b in range(B):
                pltpu.make_async_copy(
                    dec_ref.at[b, t, pl.ds(state_scr[b] >> 5, 1)],
                    word_scr.at[b], sems.at[b]).start()
            for b in range(B):
                pltpu.make_async_copy(
                    dec_ref.at[b, t, pl.ds(state_scr[b] >> 5, 1)],
                    word_scr.at[b], sems.at[b]).wait()
            for b in range(B):
                s = state_scr[b]
                word = word_scr[b, 0]
                k = jax.lax.shift_right_logical(word, s & 31) & 1
                state_scr[b] = jax.lax.shift_right_logical(s, 1) | (k << (K - 2))
                out_ref[t, b] = k
            return 0

        jax.lax.fori_loop(0, T, step, 0)

    try_case("t5_full_walk", k5, out_tb,
             [pltpu.SMEM((B,), jnp.int32), pltpu.VMEM((B, 1), jnp.int32),
              pltpu.SemaphoreType.DMA((B,))])


if __name__ == "__main__":
    LOG(f"backend: {jax.default_backend()}")
    main()
    LOG("ALL DONE")
