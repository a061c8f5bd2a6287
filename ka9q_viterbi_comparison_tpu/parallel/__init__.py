"""Multi-chip parallelism: the dimension the reference doesn't have.

Mesh axes (SURVEY §2.3):

* ``frame`` -- data parallelism over independent frames (``frame.py``).
* ``time``  -- sequence parallelism over time blocks of one long stream with
               traceback-overlap halo exchange (``timeblock.py``).
* ``state`` -- trellis state sharding for K=24's 8M-state metric vectors
               (``statewise.py``).
"""

from .frame import frame_sharded_decode, make_frame_mesh
from .timeblock import default_overlap, time_block_decode, time_block_decode_bits

__all__ = [
    "frame_sharded_decode",
    "make_frame_mesh",
    "default_overlap",
    "time_block_decode",
    "time_block_decode_bits",
]
