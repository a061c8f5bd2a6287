"""Worker process for the two-process jax.distributed frame-DP test.

Launched by tests/test_multihost.py as ``python multihost_worker.py
<process_id> <num_processes> <coordinator_port>``.  Each process owns 2
virtual CPU devices; the global mesh spans 2 processes x 2 devices = 4
devices, with the ``frame`` axis riding the cross-process (DCN-analogue)
boundary.  Prints ``MULTIHOST_OK`` on a bit-exact local decode.
"""

import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.parallel import multihost
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


def main() -> None:
    multihost.initialize(f"localhost:{port}", nprocs, proc_id)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == nprocs * 2, jax.devices()

    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 32
    B_local = 2  # one frame per local device

    # Deterministic global data; every process derives the same full batch
    # and slices its own rows (no cross-process data dependency).
    rng = np.random.default_rng(42)
    data_global = rng.integers(0, 256, size=(nprocs * B_local, n_bytes), dtype=np.uint8)
    data_local = data_global[proc_id * B_local : (proc_id + 1) * B_local]
    syms_local = np.asarray(encode_frames(code, numeric, data_local))

    out_local = multihost.decode_local_frames(
        code, numeric, syms_local, n_bytes * 8
    )
    errs = count_bit_errors(out_local, data_local)
    assert errs == 0, f"process {proc_id}: {errs} bit errors"

    # Sequence parallelism ACROSS the process boundary: each process holds a
    # contiguous time block of the SAME frames; the truncated-traceback halo
    # ppermutes cross the gloo (DCN-analogue) link.
    from ka9q_viterbi_comparison_tpu.utils.bits import bytes_to_bits

    T = code.transmit_bits(n_bytes)
    assert T % nprocs == 0, (T, nprocs)
    Tb = T // nprocs
    B_sp = nprocs * 2  # frame axis spans each process's 2 local devices
    data_sp = rng.integers(0, 256, size=(B_sp, n_bytes), dtype=np.uint8)
    syms_sp = np.asarray(encode_frames(code, numeric, data_sp)).reshape(
        B_sp, T, code.R)
    local_block = syms_sp[:, proc_id * Tb : (proc_id + 1) * Tb]
    bits_local = multihost.decode_local_time_blocks(
        code, numeric, local_block, overlap=32)
    # Traceback bit t is the bit falling off the register = input bit
    # t-K+1 (ref: viterbi27_sse2.cpp:101-102), so the expected stream is
    # K-1 initial-state zeros then the data bits.  The frame axis lives
    # WITHIN each process (time spans processes), so every frame row is
    # addressable locally; the local slice is all B_sp rows of this
    # process's time block.
    exp_bits = np.concatenate(
        [np.zeros((B_sp, code.K - 1), np.uint8),
         np.asarray(bytes_to_bits(data_sp))], axis=1)
    exp_slice = exp_bits[:, proc_id * Tb : (proc_id + 1) * Tb]
    got = bits_local
    assert got.shape == exp_slice.shape, (got.shape, exp_slice.shape)
    assert (got == exp_slice).all(), "time-sharded bits mismatch"

    # Phase 3 (VERDICT r4 item 9): the STATE axis across the process
    # boundary -- the real K=24 trellis sharded over all 4 global devices,
    # butterfly half-shard ppermutes + traceback psums riding gloo.
    from ka9q_viterbi_comparison_tpu import VITERBI224

    code24 = VITERBI224
    n24 = 8  # the reference's K=24 frame size (src/main.cpp:413)
    data24 = rng.integers(0, 256, size=(1, n24), dtype=np.uint8)
    syms24 = np.asarray(encode_frames(code24, numeric, data24)).reshape(
        1, -1, code24.R)
    out24 = multihost.decode_state_sharded(code24, numeric, syms24, n24 * 8)
    errs24 = count_bit_errors(out24, data24)
    assert errs24 == 0, f"process {proc_id}: state-sharded K=24 {errs24} errors"

    print(f"MULTIHOST_OK process={proc_id} devices={len(jax.devices())} "
          f"sp=ok state=ok", flush=True)


if __name__ == "__main__":
    main()
