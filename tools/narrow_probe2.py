#!/usr/bin/env python
"""Round-2 narrow-dtype probes.

Round 1 (tools/narrow_probe.py) established on this toolchain: int16 add and
sublane interleave lower; int16/int8 compares, selects, shifts and reductions
do NOT (and int8 add fails).  Integer narrow ACS is therefore blocked at the
compare-select.  This probe round tests the float route and two structural
optimizations of the int32 kernel:

  A. bfloat16 metrics: float compares/min lower natively on the VPU; bf16
     represents integers exactly up to 256, so with shift-to-zero renorm every
     few steps a soft8/hard8 decode is bit-exact while halving vreg count.
  B. e-mask hoisting: materialize the [S2, B] branch-bit masks once per
     kernel instead of broadcasting [S2,1]x[1,B] outer products every step.
  C. MXU decision packing: replace the 32-sublane weighted-sum pack reduction
     with two f32 matmuls against a static [W, 32] weight matrix.
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
S, B = 64, 512
S2 = S // 2
R = 2


def try_kernel(name, kernel, out_dtype, shape=(S, B), scratch=None):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(shape, out_dtype)],
            scratch_shapes=scratch or [],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
        )(jnp.zeros((S, B), jnp.int32))
        jax.block_until_ready(out)
        LOG(f"PROBE {name}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        LOG(f"PROBE {name}: FAIL {str(e).splitlines()[0][:160]}")
        return False


def feature_probes():
    dt = jnp.bfloat16

    def k_cmp(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        b = a + jnp.ones_like(a)
        o_ref[:] = jnp.where(b < a, a, b)

    try_kernel("bf16_cmp_where", k_cmp, dt)

    def k_minred(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        o_ref[:] = a - a.min(axis=0, keepdims=True)

    try_kernel("bf16_minreduce_sub", k_minred, dt)

    def k_interleave(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        o_ref[:] = jnp.stack([a[:S2], a[S2:]], axis=1).reshape(S, B)

    try_kernel("bf16_sublane_interleave", k_interleave, dt)

    def k_cmp_i32(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        o_ref[:] = ((a + jnp.ones_like(a)) < a).astype(jnp.int32)

    try_kernel("bf16_cmp_to_i32", k_cmp_i32, jnp.int32)

    # int16 isolations (for the record / docs)
    def k_i16_minimum(x_ref, o_ref):
        a = x_ref[:].astype(jnp.int16)
        o_ref[:] = jnp.minimum(a, a + jnp.ones_like(a))

    try_kernel("int16_minimum_only", k_i16_minimum, jnp.int16)

    def k_i16_shift_lit(x_ref, o_ref):
        a = x_ref[:].astype(jnp.int16)
        o_ref[:] = a >> 15

    try_kernel("int16_shift_literal", k_i16_shift_lit, jnp.int16)


# ---- full ACS variants ----

def make_acs(mode, TB):
    """mode: i32_base | i32_emask | i32_mxu | bf16 | bf16_mxu."""
    dt = jnp.bfloat16 if mode.startswith("bf16") else jnp.int32
    use_emask = mode != "i32_base"
    use_mxu = mode.endswith("mxu")

    def kernel(e_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr):
        m_scr[:] = m_in_ref[:]
        if use_emask:
            # Hoist: materialize [S2, B] masks for each (x, r) once.
            emasks = [
                [jnp.broadcast_to(e_ref[:, x * R + r : x * R + r + 1], (S2, B)).astype(dt)
                 for r in range(R)]
                for x in range(4)
            ]

        def step(t, _):
            sym = sym_ref[t]  # [R, B] int32
            base = jnp.zeros((1, B), dtype=jnp.int32)
            for r in range(R):
                base = base + (sym[r : r + 1] + 3)
            coefs = [(-2 * sym[r : r + 1]).astype(dt) for r in range(R)]
            base = base.astype(dt)
            pens = []
            for x in range(4):
                p = jnp.broadcast_to(base, (S2, B))
                for r in range(R):
                    if use_emask:
                        p = p + emasks[x][r] * coefs[r]
                    else:
                        p = p + e_ref[:, x * R + r : x * R + r + 1].astype(dt) * coefs[r]
                pens.append(p)
            m = m_scr[:]
            mlo, mhi = m[:S2], m[S2:]
            cands, decs = [], []
            for b in (0, 1):
                c_lo = mlo + pens[0 * 2 + b]
                c_hi = mhi + pens[1 * 2 + b]
                d = c_hi < c_lo
                cands.append(jnp.where(d, c_hi, c_lo))
                decs.append(d)
            new = jnp.stack(cands, axis=1).reshape(S, B)
            if dt == jnp.bfloat16:
                # Keep integers exact in bf16: shift-to-zero every 8 steps.
                def renorm(x):
                    return x - x.min(axis=0, keepdims=True)
                new = jax.lax.cond((t & 7) == 7, renorm, lambda x: x, new)
            m_scr[:] = new
            if use_mxu:
                decf = jnp.stack(
                    [d.astype(jnp.float32) for d in decs], axis=1
                ).reshape(S, B)
                kidx = jax.lax.broadcasted_iota(jnp.int32, (2, S), 1)
                widx = jax.lax.broadcasted_iota(jnp.int32, (2, S), 0)
                # weight[w, s] = 2^(s%16) if s//32==w and bit half matches
                half = jax.lax.broadcasted_iota(jnp.int32, (2, S), 0) * 0
                # two 16-bit halves to stay in f32-exact range
                lo_w = jnp.where((kidx // 32 == widx) & (kidx % 32 < 16),
                                 (1 << (kidx % 16)).astype(jnp.float32), 0.0)
                hi_w = jnp.where((kidx // 32 == widx) & (kidx % 32 >= 16),
                                 (1 << (kidx % 16)).astype(jnp.float32), 0.0)
                del half
                w_lo = jax.lax.dot_general(
                    lo_w, decf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                w_hi = jax.lax.dot_general(
                    hi_w, decf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                dec_ref[t] = w_lo + jax.lax.shift_left(w_hi, 16)
            else:
                deci = jnp.stack(
                    [d.astype(jnp.int32) for d in decs], axis=1
                ).reshape(S, B)
                j = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
                w = deci.reshape(2, 32, B) * jax.lax.shift_left(
                    jnp.ones((1, 32, 1), jnp.int32), j)
                dec_ref[t] = w.sum(axis=1)
            return 0

        jax.lax.fori_loop(0, TB, step, 0)
        m_out_ref[:] = m_scr[:]

    return kernel, dt


def acs_probe(mode, T=2048, iters=3, n_chain=5):
    tag = f"acs2_{mode}"
    kernel, dt = make_acs(mode, T)
    e = jnp.zeros((S2, 4 * R), jnp.int32)
    sym = jnp.zeros((T, R, B), jnp.int32)
    m0 = jnp.zeros((S, B), dt)
    try:
        call = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((S, B), dt),
                jax.ShapeDtypeStruct((T, 2, B), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((S, B), dt)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )

        @jax.jit
        def chain1(m, sym):
            return call(e, sym, m)

        @jax.jit
        def chainN(m, sym):
            d = None
            for _ in range(n_chain):
                m, d = call(e, sym, m)
            return m, d

        t0 = time.time()
        jax.block_until_ready(chain1(m0, sym))
        jax.block_until_ready(chainN(m0, sym))
        LOG(f"PROBE {tag}: compiled in {time.time()-t0:.0f}s")

        def timed(fn):
            t0 = time.perf_counter()
            r = fn(m0, sym)
            np.asarray(r[0][-1, -1])
            return time.perf_counter() - t0

        margs = []
        for _ in range(iters):
            t1 = min(timed(chain1), timed(chain1))
            tn = timed(chainN)
            margs.append(max((tn - t1) / (n_chain - 1), 1e-9))
        marg = float(np.median(margs))
        rate = B * T * R / marg
        LOG(f"PROBE {tag}: {rate/1e9:.2f} Gsym/s (marginal {marg*1e3:.2f} ms)")
        return rate
    except Exception as e:  # noqa: BLE001
        LOG(f"PROBE {tag}: FAIL {str(e).splitlines()[0][:200]}")
        return None


if __name__ == "__main__":
    stages = sys.argv[1:] or ["feature", "acs"]
    LOG(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    for s in stages:
        LOG(f"=== stage {s} @ {time.strftime('%H:%M:%S')}")
        if s == "feature":
            feature_probes()
        elif s == "acs":
            for mode in ("i32_base", "i32_emask", "i32_mxu", "bf16", "bf16_mxu"):
                acs_probe(mode)
    LOG("ALL DONE")
