#!/usr/bin/env python
"""BER-vs-Eb/N0 curve CLI: prints a markdown table (and optional JSON)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser("ber_curve")
    p.add_argument("--code", default="viterbi27")
    p.add_argument("--spec", default="soft16", choices=["soft16", "soft8", "hard8"])
    p.add_argument("--ebn0", type=float, nargs="+",
                   default=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    p.add_argument("--frame-bytes", type=int, default=128)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--min-errors", type=int, default=100)
    p.add_argument("--max-bits", type=int, default=5_000_000)
    p.add_argument("--backend", default="jnp", choices=["jnp", "pallas"],
                   help="decode route; pallas is ~15x faster at K=24")
    p.add_argument("--json", default=None, help="also write JSON here")
    args = p.parse_args()

    from ka9q_viterbi_comparison_tpu import (
        STANDARD_CODES, hard8_spec, soft8_spec, soft16_spec,
    )
    from ka9q_viterbi_comparison_tpu.harness.ber import ber_curve
    from ka9q_viterbi_comparison_tpu.models.decoder import decode_frames

    code = {c.name: c for c in STANDARD_CODES}[args.code]
    spec = {"soft16": soft16_spec, "soft8": soft8_spec, "hard8": hard8_spec}[args.spec](code.R)

    decode = None
    if args.backend == "pallas":
        def decode(syms):
            return decode_frames(code, spec, syms, args.frame_bytes * 8,
                                 backend="pallas")

    points = ber_curve(code, spec, args.ebn0, frame_bytes=args.frame_bytes,
                       batch=args.batch, min_errors=args.min_errors,
                       max_bits=args.max_bits, decode=decode)
    print(f"## {code.name} ({args.spec}) BER vs Eb/N0")
    print("| Eb/N0 (dB) | bits | bit errors | BER | 95% CI | uncoded | FER |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for pt in points:
        lo, hi = pt.ber_ci()
        print(f"| {pt.ebn0_db:g} | {pt.bits} | {pt.errors} | {pt.ber:.3e} "
              f"| [{lo:.2e}, {hi:.2e}] | {pt.uncoded_ber:.3e} | {pt.fer:.3e} |")
    if args.json:
        import dataclasses

        with open(args.json, "w") as f:
            json.dump(
                [dict(dataclasses.asdict(pt), ber=pt.ber, fer=pt.fer,
                      ber_ci=pt.ber_ci(), uncoded_ber=pt.uncoded_ber)
                 for pt in points],
                f,
            )


if __name__ == "__main__":
    main()
