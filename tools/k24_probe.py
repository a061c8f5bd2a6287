#!/usr/bin/env python
"""Locate the per-step cost of the K=24 path: kernel-only vs +interleave vs
full (interleave + pack), and the jnp fused scan, via marginal chained
timing."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI224, soft8_spec  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops import acs  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k  # noqa: E402

LOG = lambda *a: print(*a, flush=True)
code = VITERBI224
numeric = soft8_spec(2)
B = 4
T = 87
S = code.num_states


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if isinstance(leaf, jax.Array):
            np.asarray(leaf.ravel()[-1])


def timed(fn, *args, iters=3):
    fetch(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def marginal(label, make_fn, steps_per_call):
    f1 = make_fn(1)
    f3 = make_fn(3)
    t1 = timed(f1)
    t3 = timed(f3)
    marg = (t3 - t1) / 2
    LOG(f"{label:>16}: {marg*1e3:9.2f} ms/call  {marg/steps_per_call*1e3:8.3f} ms/step"
        f"  [t1={t1*1e3:.0f}ms]")


def main():
    rng = np.random.default_rng(0)
    sym = jnp.asarray(rng.integers(-3, 4, size=(B, T, 2), dtype=np.int32))
    m0 = acs.init_metrics(code, numeric, B)

    # Build the raw per-step pallas call the way acs_update_large does.
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    blk = large_k.pick_state_block(code)
    NB = S // blk
    half = blk // 2
    kernel = large_k._step_kernel(code, numeric, blk)
    half_shape = jax.ShapeDtypeStruct((B, S // 2), jnp.int32)
    step_call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((B, half), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda i: (0, i + NB), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((B, half), lambda i: (0, i), memory_space=pltpu.VMEM)] * 4,
        out_shape=[half_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=64 * 1024 * 1024),
    )

    weights = jax.lax.shift_left(
        jnp.ones((1, 1, 32), jnp.int32),
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2))

    def make_scan(mode):
        def body(m, sym_t):
            ne, no, de, do = step_call(m, m, sym_t)
            if mode == "kernel":
                return ne
            m2 = jnp.stack([ne, no], axis=-1).reshape(B, S)
            if mode == "inter":
                return m2
            dec = jnp.stack([de, do], axis=-1).reshape(B, S)
            words = (dec.reshape(B, S // 32, 32) * weights).sum(axis=-1)
            return m2, words

        if mode in ("kernel", "inter"):
            def body2(m, sym_t):
                if mode == "kernel":
                    ne = body(m, sym_t)
                    return jnp.concatenate([ne, ne], axis=-1), ne[:, :1]
                return body(m, sym_t), sym_t[:, :1]
            def make(n):
                @jax.jit
                def run(m, sym):
                    w = None
                    for _ in range(n):
                        m, w = jax.lax.scan(body2, m, sym.transpose(1, 0, 2))
                    return m, w
                return lambda: run(m0, sym)
            return make
        def make(n):
            @jax.jit
            def run(m, sym):
                w = None
                for _ in range(n):
                    m, w = jax.lax.scan(body, m, sym.transpose(1, 0, 2))
                return m, w
            return lambda: run(m0, sym)
        return make

    marginal("kernel-only", make_scan("kernel"), T)
    marginal("kernel+inter", make_scan("inter"), T)
    marginal("full", make_scan("full"), T)

    def make_jnp(n):
        @jax.jit
        def run(m, s):
            w = None
            for _ in range(n):
                m, w, _ = acs.acs_update(code, numeric, m, s, True)
            return m, w
        return lambda: run(m0, sym)

    marginal("jnp-fused", make_jnp, T)


if __name__ == "__main__":
    main()
