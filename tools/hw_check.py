#!/usr/bin/env python
"""Hardware correctness check at benchmark-sized frames.

Runs on the REAL TPU chip (the session default platform) and records, per
config of the reference matrix (ref: src/main.cpp:363-419):

* noiseless round-trip bit errors for the pallas and jnp backends at the
  reference frame sizes (must be 0 — the reference's own invariant,
  ref: src/util.h:64-73);
* exact decoded-bit agreement between the two backends on an AWGN-corrupted
  stream (cross-oracle check at full frame size: any dtype/relayout bug in
  the Mosaic compile path that CPU interpreter tests cannot see breaks this).

Writes ``data/tpu_hw_check.json`` — the checked-in artifact proving a
hardware test pass at bench-sized frames (not just tiny CI frames).

Usage: python tools/hw_check.py [-o data/tpu_hw_check.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu.configs import (  # noqa: E402
    BENCH_FRAME_BYTES, STANDARD_CODES, soft8_spec,
)
from ka9q_viterbi_comparison_tpu.models.decoder import decode_frames  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.channel import awgn_symbols  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames  # noqa: E402
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors  # noqa: E402

# Small batches: this is a correctness check, not a throughput run; frame
# size (the quantity CI cannot reach) is at full reference scale.
CHECK_BATCH = {"viterbi27": 16, "viterbi47": 16, "viterbi29": 16,
               "viterbi49": 16, "viterbi615": 8, "viterbi224": 2}
EBN0_DB = 6.0  # moderate noise: decisions differ from noiseless but decode succeeds


def check_code(code, rng) -> dict:
    numeric = soft8_spec(code.R)
    n_bytes = BENCH_FRAME_BYTES[code.name]
    B = CHECK_BATCH[code.name]
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    clean = encode_frames(code, numeric, jnp.asarray(data))
    num_bits = n_bytes * 8

    out_pl = np.asarray(decode_frames(code, numeric, clean, num_bits, backend="pallas"))
    out_jnp = np.asarray(decode_frames(code, numeric, clean, num_bits, backend="jnp"))
    noiseless_errs_pl = count_bit_errors(out_pl, data)
    noiseless_errs_jnp = count_bit_errors(out_jnp, data)

    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    noisy = awgn_symbols(code, numeric, key, jnp.asarray(data), EBN0_DB)
    n_pl = np.asarray(decode_frames(code, numeric, noisy, num_bits, backend="pallas"))
    n_jnp = np.asarray(decode_frames(code, numeric, noisy, num_bits, backend="jnp"))
    backend_agree = bool((n_pl == n_jnp).all())
    noisy_ber = count_bit_errors(n_jnp, data) / float(B * num_bits)

    return {
        "name": code.name, "K": code.K, "R": code.R,
        "frame_bytes": n_bytes, "batch": B,
        "noiseless_bit_errors_pallas": int(noiseless_errs_pl),
        "noiseless_bit_errors_jnp": int(noiseless_errs_jnp),
        "awgn_ebn0_db": EBN0_DB,
        "awgn_backend_bit_agreement": backend_agree,
        "awgn_ber_vs_transmitted": noisy_ber,
        "ok": noiseless_errs_pl == 0 and noiseless_errs_jnp == 0 and backend_agree,
    }


def check_inplace_envelope(rng) -> dict:
    """On-chip canary for the in-place kernel's validated-size envelope
    (VERDICT r4 item 8).  K=15 at B=512 fits the VMEM budget but MIS-LOWERS
    on the round-4 Mosaic toolchain (silently wrong metrics), so
    ``dispatch.fits_inplace_vmem`` caps the metric tile at the largest
    validated size (16384*256 lanes).  This canary keeps that boundary
    honest against toolchain updates:

    * the validated boundary shape (K=15, B=256) must route in-place and
      decode exactly;
    * the capped shape (B=512) is decoded at full size through whatever
      route the dispatcher picks: if a toolchain/config change ever admits
      it to the in-place route, silent mis-lowering becomes a loud
      exactness failure here instead.
    """
    from ka9q_viterbi_comparison_tpu.configs import VITERBI615
    from ka9q_viterbi_comparison_tpu.ops.pallas import dispatch

    code = VITERBI615
    numeric = soft8_spec(code.R)
    n_bytes = BENCH_FRAME_BYTES[code.name]
    rows = {}
    for B in (256, 512):
        data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
        clean = encode_frames(code, numeric, jnp.asarray(data))
        out = np.asarray(decode_frames(code, numeric, clean, n_bytes * 8,
                                       backend="pallas"))
        rows[f"b{B}"] = {
            "routed_inplace": bool(dispatch.use_inplace(code, B)),
            "bit_errors": int(count_bit_errors(out, data)),
        }
    rows["ok"] = (rows["b256"]["routed_inplace"]
                  and rows["b256"]["bit_errors"] == 0
                  and rows["b512"]["bit_errors"] == 0)
    # The capped shape is EXPECTED rejected on the validated toolchain;
    # record (not assert) so an envelope shift is visible in the artifact.
    rows["b512_expected_rejected"] = True
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", default="data/tpu_hw_check.json")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    dev = jax.devices()[0]
    rng = np.random.default_rng(args.seed)
    rows = []
    for code in STANDARD_CODES:
        row = check_code(code, rng)
        print(f"{code.name}: ok={row['ok']} "
              f"(noiseless errs {row['noiseless_bit_errors_pallas']}/"
              f"{row['noiseless_bit_errors_jnp']}, "
              f"agree={row['awgn_backend_bit_agreement']})", flush=True)
        rows.append(row)

    envelope = check_inplace_envelope(rng)
    print(f"inplace envelope: ok={envelope['ok']} "
          f"(b256 inplace={envelope['b256']['routed_inplace']} "
          f"errs={envelope['b256']['bit_errors']}; "
          f"b512 inplace={envelope['b512']['routed_inplace']} "
          f"errs={envelope['b512']['bit_errors']})", flush=True)

    result = {
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "seed": args.seed,
        "all_ok": all(r["ok"] for r in rows) and envelope["ok"],
        "configs": rows,
        "inplace_envelope": envelope,
    }
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    print(f"all_ok={result['all_ok']} -> {args.output}")
    sys.exit(0 if result["all_ok"] else 1)


if __name__ == "__main__":
    main()
