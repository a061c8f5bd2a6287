#!/usr/bin/env python
"""A/B: K=24 update phase with kernel-emitted walk fields vs words+XLA repack.

The fields route (``KA9Q_TPU_K24_FIELDS=1``, the default) propagates the
width-4 walk field through the depth-4 kernel's four ACS levels and never
materialises decision words; the words route builds the same table from
decision words in XLA after the kernel (the round-4 design, ~73 ms of
repack riding a ~148 ms kernel at B=8).  Both phases are timed with the
same in-jit chained marginal the bench uses (data-dependent links, no
dead-code), plus the walk phase for each.

Run: python tools/k24_fields_probe.py [B] [nbytes] [k_chain]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu.configs import VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NBYTES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
KCH = int(sys.argv[3]) if len(sys.argv) > 3 else 4

code, numeric = VITERBI224, soft8_spec(2)
rng = np.random.default_rng(0)
data = rng.integers(0, 256, size=(B, NBYTES), dtype=np.uint8)
syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
T = syms.shape[1]
nsym = B * T * code.R
nbit = B * NBYTES * 8
print(f"platform={jax.devices()[0].platform} B={B} T={T} chain={KCH}")


def measure(label):
    from ka9q_viterbi_comparison_tpu.ops.pallas import dispatch

    init_fn, update_fn, chainback_fn, prepare_fn, mk_cb, mk_up = \
        dispatch.phase_fns(code, numeric, NBYTES * 8, B)
    syms_p = prepare_fn(syms)
    m0 = init_fn(B)
    up1 = jax.jit(update_fn)
    m, w, _ = jax.block_until_ready(up1(m0, syms_p))
    out = np.asarray(chainback_fn(w))
    err = count_bit_errors(out, data)
    import numpy as _np

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        _np.asarray(leaf.reshape(-1)[-1:])  # scalar fetch: honest timing

    chains = {k: mk_up(k) for k in (1, KCH)}
    for k, c in chains.items():
        _sync(c(m0, syms_p))  # compile
    times = {}
    for k, c in chains.items():
        best = min(
            (lambda t0: (_sync(c(m0, syms_p)),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(5))
        times[k] = best
    upd_s = (times[KCH] - times[1]) / (KCH - 1)
    # NOTE: the walk phase is sub-ms here and this probe's short chains
    # cannot resolve it above the transport jitter (and block_until_ready
    # acks early on this rig); the harness's adaptive long chains are the
    # walk authority (harness/bench.py, published in RESULTS.md).
    print(f"{label}: err={err} update {upd_s*1e3:8.2f} ms -> "
          f"{nsym/upd_s/1e3:7.2f} ksym/s")


# fresh static config per variant so the flags re-read: phase_fns closures
# re-trace per call; the flags are read at trace time inside update_fn's
# first call, but jit caches key on function identity -- phase_fns returns
# new closures.
os.environ["KA9Q_TPU_K24_FIELDS"] = "1"
os.environ["KA9Q_TPU_K24_WALK"] = "8"
measure("fields8")
os.environ["KA9Q_TPU_K24_WALK"] = "4"
measure("fields4")
os.environ["KA9Q_TPU_K24_FIELDS"] = "0"
measure("words  ")
