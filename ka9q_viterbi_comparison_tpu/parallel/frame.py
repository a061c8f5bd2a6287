"""Frame-level data parallelism.

The reference decodes one frame at a time in a sequential loop
(ref: src/main.cpp:168); frames are fully independent, so on TPU they are the
embarrassingly-parallel axis: shard the batch over the ``frame`` mesh axis and
let every chip decode its slice with zero communication.  DCN-friendly --
this is the axis to span hosts with.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import CodeSpec, NumericSpec
from ..models.functional import decode_symbols

__all__ = ["frame_sharded_decode", "make_frame_mesh"]


def make_frame_mesh(devices=None, axis: str = "frame") -> Mesh:
    """1-D mesh over all (or the given) devices for frame DP."""
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis,))


def frame_sharded_decode(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols,
    num_data_bits: int,
    mesh: Mesh,
    frame_axis: str = "frame",
):
    """Decode ``[B, T*R]`` with B sharded over ``mesh[frame_axis]``.

    The decode program is pure batch math, so a sharding constraint on the
    input is enough: XLA partitions the whole pipeline with no collectives.
    """
    sharding = NamedSharding(mesh, P(frame_axis))
    if getattr(symbols, "sharding", None) != sharding:
        # Already-assembled global arrays (multi-process: parallel.multihost)
        # must not be re-placed -- device_put cannot address remote shards.
        symbols = jax.device_put(symbols, sharding)
    # In-scan penalties always: the whole-frame penalty tensor is O(T*B*2S)
    # (tens of GB for K=15 at bench batch sizes).
    return decode_symbols(code, numeric, symbols, num_data_bits, True)
