"""Mosaic narrow-compute canary (VERDICT r3 next #8).

The small-K VMEM kernels are VPU-compute-bound at int32; int16 vector
compare-select would double lanes-per-op and is the one free ~2x left on
the table (configs.py metric_dtype notes; measured probes in
tools/narrow_probe.py / narrow_probe2.py found int16/int8 compare-select,
int8 adds and narrow reductions all fail to lower on this Mosaic
toolchain).  This test re-probes the minimal failing op -- an int16 vector
compare-select in a Pallas TPU kernel -- in a subprocess against the real
chip on every suite run:

* toolchain still can't lower it  -> the test PASSES (status quo recorded);
* no TPU reachable               -> SKIP (CPU-only CI);
* the kernel suddenly compiles   -> the test FAILS LOUDLY with upgrade
  instructions, because that day the small-K kernels get a ~2x VPU-width
  win: flip NumericSpec.metric_dtype handling in configs.py to allow int16
  COMPUTE in ops/pallas/kernels.py + inplace.py and re-run
  tools/narrow_probe.py acs for the measured speedup.

The suite itself pins JAX to a virtual CPU mesh (conftest.py), so the
probe runs in a clean subprocess that restores the session's real-TPU
platform env.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent

CANARY = r"""
import sys
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if jax.default_backend() != "tpu":
    print("CANARY:NOTPU")
    sys.exit(0)

def kernel(x_ref, o_ref):
    a = x_ref[:].astype(jnp.int16)
    b = a + jnp.ones_like(a)
    o_ref[:] = jnp.where(b < a, a, b)

try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(jnp.zeros((64, 512), jnp.int32))
    jax.block_until_ready(out)
    print("CANARY:LOWERS")
except Exception as e:  # noqa: BLE001
    print("CANARY:NOLOWER", str(e).splitlines()[0][:160])
"""


def test_int16_compare_select_still_does_not_lower():
    env = dict(os.environ)
    # Undo the suite's forced-CPU platform (conftest.py) for the subprocess
    # and let the session's real platform back in.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", CANARY], env=env, cwd=str(REPO),
            capture_output=True, text=True, timeout=420)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU probe timed out (chip busy)")
    marker = [l for l in proc.stdout.splitlines() if l.startswith("CANARY:")]
    if not marker or marker[0] == "CANARY:NOTPU":
        pytest.skip(f"no TPU reachable for the Mosaic probe "
                    f"(rc={proc.returncode})")
    status = marker[0]
    assert status.startswith("CANARY:NOLOWER"), (
        "GOOD NEWS, ACT ON IT: int16 vector compare-select now LOWERS on "
        "this Mosaic toolchain. The small-K kernels are VPU-compute-bound "
        "at int32, so int16 compute is ~2x lanes/op. Do: (1) run "
        "tools/narrow_probe.py acs on hardware for the measured win, "
        "(2) thread int16 compute through ops/pallas/kernels.py and "
        "inplace.py behind NumericSpec.metric_dtype, (3) update the "
        "configs.py metric_dtype design note, then relax this canary to "
        f"assert the new status quo. Probe said: {status}")
