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
    print(f"MULTIHOST_OK process={proc_id} devices={len(jax.devices())}", flush=True)


if __name__ == "__main__":
    main()
