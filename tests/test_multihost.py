"""Two-process jax.distributed frame-DP decode (multi-host emulation).

The standard JAX way to validate multi-host code without a pod: two OS
processes, each with 2 virtual CPU devices, joined via
``jax.distributed.initialize`` with gloo cross-process collectives standing
in for DCN.  The frame mesh axis spans the process boundary, so the sharded
decode exercises exactly the multi-host placement/addressability rules a
real deployment hits (SURVEY §2.3 "multi-host via DCN").
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_frame_dp():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers timed out; partial output: {outs}")

    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "gloo" in out.lower() and "unavailable" in out.lower()
        ):
            pytest.skip(f"CPU cross-process collectives unavailable: {out[-400:]}")
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"MULTIHOST_OK process={i}" in out, out[-2000:]
