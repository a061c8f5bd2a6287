#!/usr/bin/env python
"""Probe: can the radix-plane combine run as a Pallas kernel?

The K=24 plane build (ops/radix_planes.py) is pure uint32 elementwise work
over [T, B, W] arrays, but it runs in XLA at this rig's ~96 GB/s effective
elementwise bandwidth and now DOMINATES the K=24 update phase (the depth-4
kernel cut the ACS itself to ~0.84 ms/step while the repack rides at ~1.1
ms/step-equivalent).  A Pallas version would stream at HBM rate -- IF
Mosaic can lower the one non-elementwise op in the combine: repeating each
source word 2^v times along the LANE axis (`broadcast_to(x[..., None],
(..., Q, 2^v)).reshape(..., W)`).

Probes, on hardware:
  1. lane-repeat via broadcast+reshape (the jnp formulation);
  2. lane-repeat via pltpu.repeat;
  3. lane-repeat via sublane detour: put Q on sublanes, broadcast along
     lanes, transpose back (all supported ops?);
  4. the full v=1 combine (G_2 build) as one kernel, timed vs the jnp path.

Run: python tools/repack_pallas_probe.py
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
W = 4096  # lanes per probe row (a block of K=24's 262144-word planes)
ROWS = 8


def try_kernel(name, kernel, n_in=1, out_shape=None, timed=False):
    out_shape = out_shape or jax.ShapeDtypeStruct((ROWS, W), jnp.uint32)
    try:
        x = jnp.arange(ROWS * W, dtype=jnp.uint32).reshape(ROWS, W)
        call = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        )
        out = jax.block_until_ready(call(*([x] * n_in)))
        LOG(f"PROBE {name}: OK")
        return out
    except Exception as e:  # noqa: BLE001
        LOG(f"PROBE {name}: FAIL {str(e).splitlines()[0][:150]}")
        return None


def k_repeat_reshape(x_ref, o_ref):
    x = x_ref[:, : W // 2]
    rep = jnp.broadcast_to(x[..., None], (ROWS, W // 2, 2)).reshape(ROWS, W)
    o_ref[:] = rep


def k_repeat_pltpu(x_ref, o_ref):
    o_ref[:] = pltpu.repeat(x_ref[:, : W // 2], 2, axis=1)


def k_repeat_jnp(x_ref, o_ref):
    o_ref[:] = jnp.repeat(x_ref[:, : W // 2], 2, axis=1)


def main():
    LOG(f"platform={jax.devices()[0].platform}")
    r1 = try_kernel("lane_repeat_broadcast_reshape", k_repeat_reshape)
    r2 = try_kernel("lane_repeat_pltpu_repeat", k_repeat_pltpu)
    r3 = try_kernel("lane_repeat_jnp_repeat", k_repeat_jnp)
    for name, r in (("broadcast_reshape", r1), ("pltpu_repeat", r2),
                    ("jnp_repeat", r3)):
        if r is not None:
            expect = np.repeat(
                np.arange(ROWS * W, dtype=np.uint32).reshape(ROWS, W)[:, : W // 2],
                2, axis=1)
            LOG(f"  {name} correct: {np.array_equal(np.asarray(r), expect)}")


if __name__ == "__main__":
    main()
