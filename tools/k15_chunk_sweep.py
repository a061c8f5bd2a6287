#!/usr/bin/env python
"""HW sweep: K=15 in-place update -- MXU-penalty A/B x CHUNK size x batch.

VERDICT r3 #4: the K=15 update sits at the bottom of the MFU table.  The
revised op-count roofline (ARCHITECTURE.md) says the kernel is VPU-bound at
its REAL instruction mix (~30 ops/pair incl. penalties, not the 8-op ACS
core), so the headroom is removing instructions: the KA9Q_TPU_INPLACE_MXU
path moves the penalty combos onto the idle MXU, and KA9Q_TPU_INPLACE_CHUNK
re-sweeps the live-range chunk size now that chunk addresses satisfy
Mosaic's divisibility analysis.

Each (mxu, chunk) case compiles its own kernel (the flags are read at trace
time, so every case uses fresh jit closures).  Decode correctness is
asserted per case against the natural-order jnp scan.

Run: python tools/k15_chunk_sweep.py [--batch 256] [--chunks 256,512,1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import STANDARD_CODES, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.pallas import inplace

LOG = lambda *a: print(*a, flush=True)
code = {c.name: c for c in STANDARD_CODES}[os.environ.get("SWEEP_CODE",
                                                          "viterbi615")]
numeric = soft8_spec(code.R)


def t_once(fn, *a):
    t0 = time.perf_counter()
    r = fn(*a)
    np.asarray(jax.tree.leaves(r)[0][..., -1:])
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--bytes", type=int, default=256)
    p.add_argument("--chunks", default="256,512,1024,2048")
    p.add_argument("--iters", type=int, default=7)
    p.add_argument("--chain", type=int, default=5)
    args = p.parse_args()

    B, nb = args.batch, args.bytes
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
    syms = jax.block_until_ready(
        encode_frames(code, numeric, jnp.asarray(data))
        .reshape(B, -1, code.R).astype(jnp.int32))
    T = syms.shape[1]
    Tp = inplace.pad_time_inplace(code, T, B)
    sym_native = jax.block_until_ready(
        jnp.pad(syms, ((0, 0), (0, Tp - T), (0, 0))).transpose(1, 2, 0))
    m0 = jax.block_until_ready(acs.init_metrics(code, numeric, B).T)

    # Reference metrics for the correctness check (natural jnp scan).
    m_ref, _, _ = jax.block_until_ready(
        acs.acs_update(code, numeric, acs.init_metrics(code, numeric, B),
                       syms, True))
    perm_inv = jnp.asarray(inplace.rot_perm(code, T, inverse=True))

    LOG(f"platform={jax.devices()[0].platform} B={B} T={T} Tp={Tp}")

    wps = [int(x) for x in os.environ.get("SWEEP_WORD_PACK", "0").split(",")]
    cases = []
    for mxu in (1, 0):
        for ch in [int(c) for c in args.chunks.split(",")]:
          for wp in wps:
            os.environ["KA9Q_TPU_INPLACE_MXU"] = str(mxu)
            os.environ["KA9Q_TPU_INPLACE_CHUNK"] = str(ch)
            os.environ["KA9Q_TPU_INPLACE_WORD_PACK"] = str(wp)

            def chain(n, _t=T):
                @jax.jit
                def run(m, s):
                    d = None
                    for _ in range(n):
                        m, d = inplace.acs_update_inplace.__wrapped__(
                            code, numeric, m, s, _t, 0, False)
                    return m, d

                return run

            label = f"mxu={mxu} chunk={ch} wp={wp}"
            try:
                c1, cN = chain(1), chain(args.chain)
                m_out, _ = c1(m0, sym_native)
                np.asarray(m_out[-1:, -1:])  # force compile + run
                # Correctness: un-rotate positions back to state order.
                m_state = m_out[perm_inv, :].T
                ok = bool(jnp.array_equal(m_state, m_ref))
                np.asarray(cN(m0, sym_native)[0][-1:, -1:])
                cases.append((label, c1, cN, ok))
                LOG(f"  compiled {label} exact={ok}")
            except Exception as e:  # noqa: BLE001
                LOG(f"  {label}: FAIL {str(e).splitlines()[0][:140]}")

    samples = {lab: [] for lab, *_ in cases}
    for _ in range(args.iters):
        for lab, c1, cN, _ok in cases:
            t1 = min(t_once(c1, m0, sym_native), t_once(c1, m0, sym_native))
            tn = min(t_once(cN, m0, sym_native), t_once(cN, m0, sym_native))
            samples[lab].append(max((tn - t1) / (args.chain - 1), 1e-9))

    for lab, _c1, _cN, ok in cases:
        v = np.sort(np.array(samples[lab]))
        med = float(np.median(v))
        LOG(f"{lab}: {med*1e3:7.2f} ms/call med (min {v[0]*1e3:.2f}) "
            f"-> {B * T * code.R / med / 1e6:7.1f} Msym/s  exact={ok}")
    LOG("ALL DONE")


if __name__ == "__main__":
    main()
