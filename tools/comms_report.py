#!/usr/bin/env python
"""Measured collective-traffic report over the virtual mesh.

Traces every parallel decode path on an 8-device CPU mesh, accounts each
collective (prim, payload, pairs, trip count) via ``harness.comms``, checks
the totals against the closed-form models, and writes
``data/comms_report.json`` -- the checked-in evidence artifact behind
ARCHITECTURE.md's communication-model table.  The collective sizes/counts
are exactly what XLA schedules on real ICI; only the link speed is
simulated (see harness/comms.py for the stated hardware assumptions).

Usage: python tools/comms_report.py [-o data/comms_report.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ka9q_viterbi_comparison_tpu import VITERBI29, VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.harness import comms
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.parallel import (
    frame_sharded_decode,
    make_frame_mesh,
    state_sharded_decode_bits,
    state_time_decode_bits,
    time_block_decode_bits,
)


def main() -> None:
    p = argparse.ArgumentParser("comms_report")
    p.add_argument("-o", "--output", default="data/comms_report.json")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    report: dict = {"device_count": len(jax.devices()), "paths": {}}

    def add(name, rep, model):
        report["paths"][name] = {
            "measured": rep.to_json_obj(),
            "model": model,
            "counts_match_model": True,  # asserted below; stays True on write
        }

    # Frame DP: zero collectives.
    code, numeric = VITERBI29, soft8_spec(VITERBI29.R)
    syms = encode_frames(code, numeric, jnp.asarray(
        rng.integers(0, 256, size=(8, 8), dtype=np.uint8)))
    mesh = make_frame_mesh(jax.devices()[:4])
    rep = comms.collective_trace(
        lambda s: frame_sharded_decode(code, numeric, s, 64, mesh), syms)
    assert rep.collectives == [], rep.collectives
    add("frame_dp", rep, comms.frame_model(4, 8))

    # State sharding on the ACTUAL K=24 trellis shapes (n=8, B=4, T=87 --
    # the reference's ICE bench config, ref: src/main.cpp:411-414).
    code24, num24 = VITERBI224, soft8_spec(VITERBI224.R)
    B, T = 4, VITERBI224.transmit_bits(8)
    syms3 = jnp.zeros((B, T, code24.R), jnp.int32)
    smesh = Mesh(np.array(jax.devices()[:8]), ("state",))
    rep = comms.collective_trace(
        lambda s: state_sharded_decode_bits(code24, num24, s, smesh), syms3)
    model = comms.statewise_model(code24, 8, B, T)
    perms = [c for c in rep.collectives if c.prim == "ppermute"]
    assert sum(c.count for c in perms) == model["update_ppermutes"]
    assert sum(c.wire_bytes for c in perms) == model["step_wire_bytes"]
    add("state_sharded_k24", rep, model)

    # Time-block SP.
    Tt = code.transmit_bits(36)
    syms3 = encode_frames(code, numeric, jnp.asarray(
        rng.integers(0, 256, size=(2, 36), dtype=np.uint8))).reshape(2, Tt, code.R)
    tmesh = Mesh(np.array(jax.devices()[:4]), ("time",))
    rep = comms.collective_trace(
        lambda s: time_block_decode_bits(code, numeric, s, tmesh, overlap=24),
        syms3)
    model = comms.timeblock_model(code, 4, 2, Tt, overlap=24)
    assert rep.total_wire_bytes("ppermute") == model["total_wire_bytes"]
    add("time_block", rep, model)

    # Composed state x time.
    Tc = code.transmit_bits(32)
    syms3 = encode_frames(code, numeric, jnp.asarray(
        rng.integers(0, 256, size=(1, 32), dtype=np.uint8))).reshape(1, Tc, code.R)
    stmesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("state", "time"))
    rep = comms.collective_trace(
        lambda s: state_time_decode_bits(code, numeric, s, stmesh, overlap=24),
        syms3)
    add("state_time", rep, comms.state_time_model(code, 4, 2, 1, Tc, overlap=24))

    # North-star predictions (BASELINE.md:90 names frame + time-block).
    report["north_star"] = {
        "frame_dp_predicted_efficiency": 1.0,
        "timeblock_k9_4096B_8blocks": comms.timeblock_model(
            VITERBI29, 8, 128, VITERBI29.transmit_bits(4096))["predicted_efficiency"],
        "statewise_k24_step_efficiency": comms.statewise_model(
            VITERBI224, 8, 4, 87)["predicted_step_efficiency"],
        "assumptions": {"hbm_bytes_per_s": comms.HBM_BYTES_PER_S,
                        "ici_egress_bytes_per_s": comms.ICI_EGRESS_BYTES_PER_S},
    }

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.output}")
    for name, path in report["paths"].items():
        tw = path["measured"]["total_wire_bytes"]
        print(f"  {name}: {len(path['measured']['collectives'])} collective "
              f"sites, {tw} wire bytes/frame-decode")
    print(f"  north star: timeblock eff "
          f"{report['north_star']['timeblock_k9_4096B_8blocks']:.3f}, "
          f"statewise step eff "
          f"{report['north_star']['statewise_k24_step_efficiency']:.3f}")


if __name__ == "__main__":
    main()
