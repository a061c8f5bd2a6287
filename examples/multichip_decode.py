#!/usr/bin/env python
"""Example: multi-device decoding on a mesh.

Runs on whatever devices are available; to try it on one machine:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip_decode.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.parallel import (
    frame_sharded_decode,
    make_frame_mesh,
    time_block_decode,
)
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


def main() -> None:
    code, numeric = VITERBI27, soft8_spec(2)
    devices = jax.devices()
    print(f"{len(devices)} device(s): {devices[0].platform}")

    n_bytes = 256
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(2 * len(devices), n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))

    # Frame data-parallelism: shard the batch, zero communication.
    mesh = make_frame_mesh()
    out = frame_sharded_decode(code, numeric, syms, n_bytes * 8, mesh)
    print("frame-DP decode errors:", count_bit_errors(np.asarray(out), data))

    # Time-block sequence parallelism: one long stream split across devices
    # with traceback-overlap halo exchange.
    if len(devices) > 1:
        T = code.transmit_bits(n_bytes)
        n_t = len(devices)
        pad = (-T) % n_t
        mid = (numeric.soft_high + numeric.soft_low) // 2
        syms3 = jnp.pad(syms.reshape(-1, T, code.R), ((0, 0), (0, pad), (0, 0)),
                        constant_values=mid)
        tmesh = Mesh(np.array(devices), ("time",))
        out2 = time_block_decode(code, numeric, syms3, n_bytes * 8, tmesh)
        print("time-block decode errors:", count_bit_errors(np.asarray(out2), data))


if __name__ == "__main__":
    main()
