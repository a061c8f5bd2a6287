"""Multi-host (multi-process) frame data-parallelism over DCN.

The reference is strictly single-process (SURVEY §2.3); frames are the axis
that spans hosts because decoding them needs zero inter-frame communication
(``parallel.frame``).  This module supplies the multi-process plumbing that
turns per-host frame batches into one global sharded decode:

* ``initialize(...)`` -- thin wrapper over :func:`jax.distributed.initialize`
  that also selects the CPU collectives backend when running the
  multi-process CPU emulation (the standard JAX way to exercise multi-host
  code paths without a pod: N OS processes x M virtual devices each, DCN
  replaced by gloo over localhost; see tests/test_multihost.py).
* ``global_frame_batch(local, mesh)`` -- assemble each process's local frame
  batch into one global ``jax.Array`` sharded over the ``frame`` mesh axis
  (process-local data placement, no cross-host transfer).
* ``decode_local_frames(...)`` -- end-to-end: global assembly, sharded
  decode, return this process's decoded shard as host numpy.
* ``decode_local_time_blocks(...)`` -- sequence parallelism ACROSS hosts:
  each process holds a contiguous time block of the same frames, the
  ``time`` mesh axis spans the process boundary, and the truncated-
  traceback halo exchange (``parallel.timeblock``) rides the cross-process
  link -- the "boundary path metrics + overlap over DCN" path of
  SURVEY §2.3.

On a real multi-host TPU deployment the same calls run unchanged: ``mesh``
spans all hosts' devices, the sharded axes ride DCN, and each host feeds
and reads back only its addressable shards.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import CodeSpec, NumericSpec
from .frame import frame_sharded_decode
from .statewise import state_sharded_decode
from .timeblock import time_block_decode_bits

__all__ = [
    "initialize",
    "global_frame_mesh",
    "global_frame_batch",
    "decode_local_frames",
    "decode_local_time_blocks",
    "decode_state_sharded",
    "local_shard",
]


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    cpu_collectives: str | None = "gloo",
) -> None:
    """Join the distributed runtime (idempotent per process).

    ``cpu_collectives`` selects the CPU cross-process collectives backend
    ("gloo" is the portable default); pass ``None`` on real TPU pods (ICI/DCN
    collectives need no host backend).  Must run before anything initialises
    the XLA backend (so no backend queries happen here).
    """
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_frame_mesh(axis: str = "frame") -> Mesh:
    """1-D mesh over ALL global devices (every process's), frame DP axis."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def global_frame_batch(local: np.ndarray, mesh: Mesh, axis: str = "frame"):
    """Per-process ``[B_local, ...]`` host data -> global ``jax.Array``
    ``[B_global, ...]`` sharded over ``mesh[axis]``.

    Placement is process-local: each process contributes only its own rows
    (the global batch is the concatenation in process order), so assembly
    moves no data across hosts.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    global_shape = (local.shape[0] * jax.process_count(), *local.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local, global_shape)


def local_shard(arr) -> np.ndarray:
    """This process's rows of a frame-sharded global array, in order."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def decode_local_frames(
    code: CodeSpec,
    numeric: NumericSpec,
    local_symbols: np.ndarray,
    num_data_bits: int,
    mesh: Mesh | None = None,
    axis: str = "frame",
) -> np.ndarray:
    """Decode this process's ``[B_local, T*R]`` frames as part of the global
    frame-sharded batch; returns the local decoded bytes ``[B_local, n]``."""
    mesh = mesh or global_frame_mesh(axis)
    syms = global_frame_batch(np.asarray(local_symbols), mesh, axis)
    out = frame_sharded_decode(code, numeric, syms, num_data_bits, mesh, axis)
    return local_shard(out)


def decode_state_sharded(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: np.ndarray,
    num_data_bits: int,
    mesh: Mesh | None = None,
    state_axis: str = "state",
) -> np.ndarray:
    """State-sharded decode with the trellis STATE axis spanning processes.

    Each process's devices own contiguous blocks of the 2^(K-1) state
    vector, so the butterfly's half-shard ``ppermute``s and the traceback's
    per-step owner ``psum`` (``parallel.statewise``) cross the host
    boundary on every trellis step -- the K=24 "metric vector too big for
    one host" configuration of SURVEY §2.3.  ``symbols`` ``[B, T, R]`` are
    replicated (every process passes the same array).  Returns decoded
    bytes ``[B, num_data_bits // 8]`` on every process.
    """
    mesh = mesh or Mesh(np.asarray(jax.devices()), (state_axis,))
    local = np.asarray(symbols)
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        syms = jax.device_put(local, sharding)
    else:
        syms = jax.make_array_from_process_local_data(
            sharding, local, local.shape)
    out = state_sharded_decode(code, numeric, syms, num_data_bits, mesh,
                               state_axis)
    return np.asarray(jax.device_get(out))


def cross_process_time_mesh(frame_axis: str = "frame",
                            time_axis: str = "time") -> Mesh:
    """2-D mesh with the TIME axis spanning processes (one time block per
    process; any per-process devices shard frames within the block), so the
    time-block halo exchange crosses the host boundary."""
    devs = np.asarray(jax.devices())
    per_proc = max(1, len(devs) // max(1, jax.process_count()))
    return Mesh(devs.reshape(-1, per_proc), (time_axis, frame_axis))


def decode_local_time_blocks(
    code: CodeSpec,
    numeric: NumericSpec,
    local_symbols: np.ndarray,
    mesh: Mesh | None = None,
    overlap: int | None = None,
    frame_axis: str = "frame",
    time_axis: str = "time",
) -> np.ndarray:
    """Sequence-parallel decode with time blocks spanning processes.

    ``local_symbols``: this process's contiguous time block ``[B, Tb, R]``
    of the shared frame batch (blocks concatenate in process order to the
    global ``[B, T, R]`` stream).  The warm-up halos move ``overlap`` symbol
    groups across the process boundary (DCN analogue).  Returns this
    process's decoded trellis-bit slice ``[B_local_rows, Tb]`` uint8.
    """
    mesh = mesh or cross_process_time_mesh(frame_axis, time_axis)
    local = np.asarray(local_symbols)
    B, Tb, R = local.shape
    sharding = NamedSharding(mesh, P(frame_axis, time_axis, None))
    if jax.process_count() == 1:
        syms = jax.device_put(local, sharding)
    else:
        global_shape = (B, Tb * jax.process_count(), R)
        syms = jax.make_array_from_process_local_data(sharding, local,
                                                      global_shape)
    bits = time_block_decode_bits(
        code, numeric, syms, mesh, overlap, time_axis, frame_axis)
    shards = sorted(bits.addressable_shards,
                    key=lambda s: (s.index[0].start or 0,
                                   s.index[1].start or 0))
    rows: dict[int, list[np.ndarray]] = {}
    for s in shards:
        rows.setdefault(s.index[0].start or 0, []).append(np.asarray(s.data))
    return np.concatenate(
        [np.concatenate(rows[k], axis=1) for k in sorted(rows)], axis=0)
