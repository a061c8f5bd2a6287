"""Measure the bit-plane radix repack + walk at K=24 bench shapes on TPU.

Timing discipline per tools/k24_sweep.py: host-readback sync (block_until_
ready is unreliable on this rig), rotated inputs + fed-forward state so the
transport cannot short-circuit repeats, quiet-window canary, medians.

Measures, at B frames x T=87 steps (the bench config):
  1. update-only vs update+repack (build_plane_tables) -- repack overhead
  2. plane walk marginal via in-jit chained endstates (k=1 vs k=17)
  3. plain-walk marginal for reference

Run: python tools/k24_plane_probe.py [B] [T]
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
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb, radix_planes as rp
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

LOG = lambda *a: print(*a, flush=True)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
T = int(sys.argv[2]) if len(sys.argv) > 2 else 87
code = VITERBI224
numeric = soft8_spec(code.R)
W = code.num_states // 32
nbits = (T - code.K + 1) // 8 * 8
ANCHOR = code.K - 1  # dispatch's anchor: first kept data bit (time-major route)
rng = np.random.default_rng(0)
LOG(f"B={B} T={T} W={W} nbits={nbits} anchor={ANCHOR}")


def make_update(with_planes: bool):
    state = {"m": jnp.zeros((B, code.num_states), jnp.int32), "i": 0}
    syms = [jnp.asarray(rng.integers(0, 7, size=(B, T, code.R)), jnp.int32)
            for _ in range(4)]

    @jax.jit
    def f(m, s):
        # Mirrors ops/pallas/dispatch.py's plane route exactly: time-major
        # words out of the kernel, jnp g2 (kernel emission measured slower),
        # anchor at the first kept data bit.
        if with_planes:
            m, w, off = large_k2.acs_update_large2.__wrapped__(
                code, numeric, m, s, False, "int16", False, True)
            tabs = rp.build_plane_tables.__wrapped__(code, w, ANCHOR)
            return m, (w, tabs), off
        m, w, off = large_k2.acs_update_large2.__wrapped__(
            code, numeric, m, s, False, "int16", False, True)
        return m, (w, None), off

    def run():
        m, wt, off = f(state["m"], syms[state["i"] % 4])
        state["m"] = m
        state["i"] += 1
        return m, wt, off

    return run


def sync(x):
    np.asarray(x[..., -1:])


def t_update(run):
    t0 = time.perf_counter()
    m, (w, tabs), off = run()
    sync(m)
    if tabs is not None:
        sync(tabs["f4"])
    return time.perf_counter() - t0


# walks: in-jit chain of k dependent walks (endstate fed forward)
def make_walk_chain(k, plane: bool):
    upd = make_update(plane)
    m, (w, tabs), _ = upd()

    if plane:
        @jax.jit
        def runk(w, tabs, es0):
            out0, ss0 = rp.chainback_plane_bits(code, w, tabs, nbits, es0, ANCHOR)

            def body(_, carry):
                es, prev = carry
                out, ss = rp.chainback_plane_bits(code, w, tabs, nbits, es, ANCHOR)
                return ss[0], out

            _, out = jax.lax.fori_loop(0, k - 1, body, (ss0[0], out0))
            return out

        args = (w, tabs)
    else:
        # plain walk consumes batch-major words; transpose once in setup so
        # the timed chain never pays it
        w = jax.block_until_ready(jnp.transpose(w, (1, 0, 2)))

        @jax.jit
        def runk(w, es0):
            out0, ss0 = cb.chainback_bits(code, w, nbits, es0)

            def body(_, carry):
                es, prev = carry
                out, ss = cb.chainback_bits(code, w, nbits, es)
                return ss[0], out

            _, out = jax.lax.fori_loop(0, k - 1, body, (ss0[0], out0))
            return out

        args = (w,)

    state = {"i": 0}

    def run():
        out = runk(*args, jnp.int32(state["i"] % 7))
        state["i"] += 1
        return out

    sync(run())
    return run


def t_walk(run):
    t0 = time.perf_counter()
    out = run()
    sync(out)
    return time.perf_counter() - t0


LOG("compiling...")
upd_plain = make_update(False)
upd_planes = make_update(True)
t_update(upd_plain)
t_update(upd_planes)
walk1 = make_walk_chain(1, True)
walk17 = make_walk_chain(129, True)
pwalk1 = make_walk_chain(1, False)
pwalk5 = make_walk_chain(5, False)
LOG("compiled")

# quiet window
canary = make_update(False)
QUIET_MS = float(os.environ.get("QUIET_MS", "160.0"))
t_start = time.time()
while True:
    t_c = min(t_update(canary) for _ in range(2)) * 1e3
    if t_c <= QUIET_MS:
        LOG(f"quiet window (canary {t_c:.1f} ms)")
        break
    if time.time() - t_start > 520:
        LOG(f"NO QUIET WINDOW (canary {t_c:.1f} ms)")
        sys.exit(2)
    time.sleep(10)

rows = {"upd": [], "upd+rp": [], "walk1": [], "walk17": [], "pw1": [], "pw5": []}
for it in range(9):
    rows["upd"].append(min(t_update(upd_plain), t_update(upd_plain)))
    rows["upd+rp"].append(min(t_update(upd_planes), t_update(upd_planes)))
    rows["walk1"].append(min(t_walk(walk1), t_walk(walk1)))
    rows["walk17"].append(min(t_walk(walk17), t_walk(walk17)))
    rows["pw1"].append(min(t_walk(pwalk1), t_walk(pwalk1)))
    rows["pw5"].append(min(t_walk(pwalk5), t_walk(pwalk5)))

med = {k: float(np.median(v)) for k, v in rows.items()}
for k, v in rows.items():
    LOG(f"{k:8s} med {med[k]*1e3:8.2f} ms  (min {min(v)*1e3:.2f})")

upd_rate = B * T * code.R / med["upd"]
updrp_rate = B * T * code.R / med["upd+rp"]
LOG(f"update-only rate      {upd_rate/1e3:.2f} ksym/s (aggregate B={B})")
LOG(f"update+repack rate    {updrp_rate/1e3:.2f} ksym/s; repack adds "
    f"{(med['upd+rp']-med['upd'])*1e3:.1f} ms = {(med['upd+rp']/med['upd']-1)*100:.0f}%")
walk_marg = (med["walk17"] - med["walk1"]) / 128
pw_marg = (med["pw5"] - med["pw1"]) / 4
LOG(f"plane walk marginal   {walk_marg*1e6:.1f} us -> {B*nbits/walk_marg/1e6:.2f} Mbit/s aggregate"
    f" ({nbits/walk_marg/1e6:.2f} per-frame)")
LOG(f"plain walk marginal   {pw_marg*1e6:.1f} us -> {B*nbits/pw_marg/1e6:.3f} Mbit/s aggregate"
    f" ({nbits/pw_marg/1e6:.3f} per-frame)")
LOG("ALL DONE")
