#!/usr/bin/env python
"""Where does the K=24 update's time go?

Times three nested slices of the large_k2 two-step pair on real HW:

  full    — pair_body as shipped (kernel + XLA residue re-interleave, via
            acs_update_large2 over T=2 symbols)
  kernel  — the pallas step_call alone (no XLA stack/reshape afterwards)
  nopen   — the same kernel with the branch-penalty computation stubbed to
            the symbol base (no parity folds, no e*coef multiplies): an
            upper bound on what removing penalty compute could buy

If kernel ~= full, the XLA interleave is immaterial; if nopen << kernel,
the kernel is penalty-compute-bound and static e-tables are the lever.
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
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k, large_k2

LOG = lambda *a: print(*a, flush=True)

code = VITERBI224
numeric = soft8_spec(code.R)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
S = code.num_states
PACK = large_k2.PACK
C = S // PACK
blk = large_k.pick_state_block(code)
NB = S // blk
Lb4 = blk // (4 * PACK)
mdt = jnp.int16
LOG(f"B={B} S={S} blk={blk} NB={NB} Lb4={Lb4}")
_real_fold = large_k2._parity_fold


def make_step_call(stub_penalties: bool, use_tables: bool = False):
    if stub_penalties:
        # Collapse the parity folds to a trace-time constant: e_lo/e_hi
        # become Python ints, so the e*coef products and most adds vanish.
        large_k2._parity_fold = lambda x: 0
    else:
        large_k2._parity_fold = _real_fold
    m_shape = jax.ShapeDtypeStruct((B, PACK, C // 4), mdt)
    w_shape = jax.ShapeDtypeStruct((B, C // 4), jnp.int32)
    in_spec = lambda k: pl.BlockSpec(
        (B, PACK, Lb4), lambda j, k=k: (0, 0, j + k * NB), memory_space=pltpu.VMEM
    )
    out3 = pl.BlockSpec((B, PACK, Lb4), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((B, Lb4), lambda j: (0, j), memory_space=pltpu.VMEM)
    in_specs = [in_spec(0), in_spec(1), in_spec(2), in_spec(3),
                pl.BlockSpec((B, 2 * code.R), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)]
    table_args = ()
    if use_tables:
        t0_np, t1_np = large_k2._par_tables_np(code)
        tspec = lambda off: pl.BlockSpec(
            (PACK, Lb4), lambda j, off=off: (0, j + off), memory_space=pltpu.VMEM)
        in_specs += [tspec(0), tspec(NB), tspec(0), tspec(0)]
        t0 = jnp.asarray(t0_np)
        table_args = (t0, t0, jnp.asarray(t1_np[0]), jnp.asarray(t1_np[1]))
    call = pl.pallas_call(
        large_k2._pair_kernel(code, numeric, Lb4, NB, mdt, use_tables),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=[out3] * 4 + [out2] * 8,
        out_shape=[m_shape] * 4 + [w_shape] * 8,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    return lambda m, s: call(m, m, m, m, s, *table_args)


m3 = jnp.zeros((B, PACK, C), mdt)
sym_pair = jnp.zeros((B, 2 * code.R), jnp.int32)

# full: 2-symbol acs_update_large2 (includes shift_to_zero + interleave)
m0_bs = jnp.zeros((B, S), jnp.int32)
sym2 = jnp.zeros((B, 2, code.R), jnp.int32)
full = jax.jit(lambda m, s: large_k2.acs_update_large2.__wrapped__(
    code, numeric, m, s, False, "int16"))

cases = [("full", lambda: full(m0_bs, sym2))]
for name, stub, tabs in (("kernel-fold", False, False),
                         ("kernel-tables", False, True),
                         ("nopen", True, False)):
    call = make_step_call(stub, tabs)
    f = jax.jit(call)
    cases.append((name, lambda f=f: f(m3, sym_pair)))

for name, fn in cases:
    t0c = time.time()
    jax.block_until_ready(fn())
    LOG(f"  compiled {name} ({time.time()-t0c:.0f}s)")

# Interleave variants within each iteration so contention hits all alike.
# Under shared-chip contention the MIN approximates the uncontended time.
iters = int(os.environ.get("PROBE_ITERS", "60"))
samples = {name: [] for name, _ in cases}
for it in range(iters):
    for name, fn in cases:
        t0 = time.perf_counter()
        r = fn()
        # Host readback of one element: block_until_ready is not a reliable
        # sync on this rig's experimental platform.
        np.asarray(jax.tree.leaves(r)[0][..., -1:])
        samples[name].append(time.perf_counter() - t0)
for name, _ in cases:
    v = np.sort(np.array(samples[name])) * 1e3
    LOG(f"{name} (2 steps): min {v[0]:.2f} p10 {v[len(v)//10]:.2f} "
        f"med {np.median(v):.2f} ms")

LOG("ALL DONE")
