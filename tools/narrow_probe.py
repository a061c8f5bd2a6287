#!/usr/bin/env python
"""Probe Mosaic/TPU support for narrow-dtype (int16/int8) Viterbi ACS kernels.

The reference's defining comparison axis is numeric width (u8-modulo /
u8-saturating / s16-saturating register families, ref:
ka9q_libfec_port/viterbi27_sse2.cpp vs spiral/spiral27.cpp vs
viterbi615_sse2.cpp).  On TPU the analogue is metric storage dtype: int16
packs 2 metrics per 32-bit VPU lane, int8 packs 4.  This probe answers, on
real hardware:

  1. which primitive ops lower for int16/int8 vectors (add, compare, select,
     min+eq, sign-mask arithmetic select, sublane interleave, shifts,
     sublane min-reduction, scalar broadcast);
  2. whether a full dtype-parametrized ACS step kernel compiles;
  3. what the measured update throughput is vs the int32 kernel.

Run:  JAX_COMPILATION_CACHE_DIR=... python tools/narrow_probe.py [feature|acs]
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
S, B = 64, 512  # K=7-sized arrays


def try_kernel(name, kernel, out_dtype, n_out=1, shape=(S, B)):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(shape, out_dtype)] * n_out,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
        )(jnp.zeros((S, B), jnp.int32))
        jax.block_until_ready(out)
        LOG(f"PROBE {name}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        LOG(f"PROBE {name}: FAIL {msg}")
        return False


def feature_probes(dt):
    tag = np.dtype(dt).name

    def k_add(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        o_ref[:] = (a + a + jnp.ones_like(a)).astype(dt)

    try_kernel(f"{tag}_add", k_add, dt)

    def k_cmp(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        b = a + jnp.ones_like(a)
        d = b < a
        o_ref[:] = jnp.where(d, a, b)

    try_kernel(f"{tag}_cmp_where", k_cmp, dt)

    def k_mineq(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        b = a + jnp.ones_like(a)
        m = jnp.minimum(a, b)
        o_ref[:] = jnp.where(m == b, a, b)

    try_kernel(f"{tag}_min_eq", k_mineq, dt)

    def k_signsel(x_ref, o_ref):
        # Arithmetic select: mask = (b - a) >> (bits-1); out = b + (diff&mask).
        a = x_ref[:].astype(dt)
        b = a + jnp.ones_like(a)
        diff = a - b
        bits = jnp.dtype(dt).itemsize * 8 - 1
        mask = jax.lax.shift_right_arithmetic(diff, jnp.array(bits, dt))
        o_ref[:] = b + (diff & mask)

    try_kernel(f"{tag}_signmask_sel", k_signsel, dt)

    def k_interleave(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        lo, hi = a[: S // 2], a[S // 2 :]
        o_ref[:] = jnp.stack([lo, hi], axis=1).reshape(S, B)

    try_kernel(f"{tag}_sublane_interleave", k_interleave, dt)

    def k_minred(x_ref, o_ref):
        a = x_ref[:].astype(dt)
        m = a.min(axis=0, keepdims=True)
        o_ref[:] = a - m

    try_kernel(f"{tag}_minreduce_sub", k_minred, dt)

    def k_cast_pack(x_ref, o_ref):
        # decision extraction in int32 from narrow compare
        a = x_ref[:].astype(dt)
        d = (a + jnp.ones_like(a)) < a
        o_ref[:] = d.astype(jnp.int32)

    try_kernel(f"{tag}_cmp_to_i32", k_cast_pack, jnp.int32)


# ---- full ACS step kernel, dtype-parametrized ----

def make_acs(dt, TB, sel_mode="cmp"):
    """K=7-shaped kernel: metrics [S,B] dt resident, TB steps per call."""
    S2 = S // 2
    R = 2

    def kernel(e_ref, sym_ref, m_in_ref, m_out_ref, dec_ref, m_scr):
        m_scr[:] = m_in_ref[:]

        def step(t, _):
            sym = sym_ref[t]  # [R, B] int32
            base = jnp.zeros((1, B), dtype=jnp.int32)
            for r in range(R):
                base = base + (sym[r : r + 1] + 3)
            pens = []
            for x in range(4):
                p = base
                for r in range(R):
                    e = e_ref[:, x * R + r : x * R + r + 1]
                    coef = -2 * sym[r : r + 1]
                    p = p + e * coef
                pens.append(p.astype(dt))
            m = m_scr[:]
            mlo = m[:S2]
            mhi = m[S2:]
            cands = []
            decs = []
            for b in (0, 1):
                c_lo = mlo + pens[0 * 2 + b]
                c_hi = mhi + pens[1 * 2 + b]
                if sel_mode == "cmp":
                    d = c_hi < c_lo
                    cands.append(jnp.where(d, c_hi, c_lo))
                    decs.append(d.astype(jnp.int32))
                else:  # signmask
                    diff = c_hi - c_lo
                    bits = jnp.dtype(dt).itemsize * 8 - 1
                    mask = jax.lax.shift_right_arithmetic(diff, jnp.array(bits, dt))
                    cands.append(c_lo + (diff & mask))
                    decs.append((mask & jnp.ones_like(mask)).astype(jnp.int32))
            new = jnp.stack(cands, axis=1).reshape(S, B)
            dec = jnp.stack(decs, axis=1).reshape(S, B)
            # renorm every 64 steps: subtract per-lane min (keeps int16/int8 bounded)
            if jnp.dtype(dt).itemsize < 4:
                def renorm():
                    return new - new.min(axis=0, keepdims=True)
                new = jax.lax.cond((t & 63) == 63, renorm, lambda: new)
            m_scr[:] = new
            j = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
            w = dec.reshape(2, 32, B) * jax.lax.shift_left(
                jnp.ones((1, 32, 1), jnp.int32), j)
            dec_ref[t] = w.sum(axis=1)
            return 0

        jax.lax.fori_loop(0, TB, step, 0)
        m_out_ref[:] = m_scr[:]

    return kernel


def acs_probe(dt, sel_mode, T=2048, iters=3, n_chain=5):
    tag = f"acs_{np.dtype(dt).name}_{sel_mode}"
    TB = T
    e = jnp.zeros((S // 2, 8), jnp.int32)
    sym = jnp.zeros((T, 2, B), jnp.int32)
    m0 = jnp.zeros((S, B), dt)

    try:
        call = pl.pallas_call(
            make_acs(dt, TB, sel_mode),
            out_shape=[
                jax.ShapeDtypeStruct((S, B), dt),
                jax.ShapeDtypeStruct((T, 2, B), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )

        @jax.jit
        def chain1(m, sym):
            m, d = call(e, sym, m)
            return m, d

        @jax.jit
        def chainN(m, sym):
            d = None
            for _ in range(n_chain):
                m, d = call(e, sym, m)
            return m, d

        t0 = time.time()
        jax.block_until_ready(chain1(m0, sym))
        LOG(f"PROBE {tag}: compiled chain1 in {time.time()-t0:.0f}s")
        t0 = time.time()
        jax.block_until_ready(chainN(m0, sym))
        LOG(f"PROBE {tag}: compiled chainN in {time.time()-t0:.0f}s")

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
        rate = B * T * 2 / marg
        LOG(f"PROBE {tag}: {rate/1e9:.2f} Gsym/s (marginal {marg*1e3:.2f} ms)")
        return rate
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        LOG(f"PROBE {tag}: FAIL {msg}")
        return None


if __name__ == "__main__":
    stages = sys.argv[1:] or ["feature", "acs"]
    LOG(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    for s in stages:
        LOG(f"=== stage {s} @ {time.strftime('%H:%M:%S')}")
        if s == "feature":
            for dt in (jnp.int16, jnp.int8):
                feature_probes(dt)
        elif s == "acs":
            acs_probe(jnp.int32, "cmp")
            r16 = acs_probe(jnp.int16, "cmp")
            if r16 is None:
                acs_probe(jnp.int16, "signmask")
            r8 = acs_probe(jnp.int8, "cmp")
            if r8 is None:
                acs_probe(jnp.int8, "signmask")
    LOG("ALL DONE")
