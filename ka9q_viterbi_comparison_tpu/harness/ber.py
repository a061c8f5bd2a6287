"""BER-vs-Eb/N0 evaluation.

The reference carries full soft-decision machinery but never exercises it
with noise (SURVEY §4); this module measures the thing soft decisions exist
for: coded bit-error rate across AWGN operating points, batched on device.
Used by tests (coding-gain assertions) and the `tools/ber_curve.py` CLI.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CodeSpec, NumericSpec
from ..models.functional import decode_symbols
from ..ops.channel import awgn_symbols
from ..utils.bits import count_bit_errors

__all__ = ["BerPoint", "measure_ber", "ber_curve"]


@dataclasses.dataclass
class BerPoint:
    ebn0_db: float
    bits: int
    errors: int
    frames: int
    frame_errors: int

    @property
    def ber(self) -> float:
        return self.errors / self.bits if self.bits else 0.0

    @property
    def fer(self) -> float:
        return self.frame_errors / self.frames if self.frames else 0.0

    def ber_ci(self, z: float = 1.96) -> tuple[float, float]:
        """95 % Wilson score interval for the BER (binomial ``errors`` out
        of ``bits``).  Caveat stated where used: bit errors within one frame
        are correlated (error events span several trellis steps), so the
        binomial interval is anti-conservative at the margin -- quoted
        because it makes the statistical weight of each point explicit
        (VERDICT r3 #6), with ``min_errors`` the primary control."""
        n = self.bits
        if not n:
            return (0.0, 0.0)
        p = self.errors / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = (z / denom) * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5)
        return (max(center - half, 0.0), min(center + half, 1.0))

    @property
    def uncoded_ber(self) -> float:
        """Uncoded BPSK BER at the same Eb/N0: Q(sqrt(2 Eb/N0)) -- the curve
        every published coded point's CI must exclude."""
        import math

        ebn0 = 10 ** (self.ebn0_db / 10)
        return 0.5 * math.erfc(math.sqrt(ebn0))


def measure_ber(
    code: CodeSpec,
    numeric: NumericSpec,
    ebn0_db: float,
    frame_bytes: int = 128,
    batch: int = 64,
    min_errors: int = 100,
    max_bits: int = 10_000_000,
    seed: int = 0,
    decode=None,
) -> BerPoint:
    """Monte-Carlo BER at one operating point: decode batches of AWGN frames
    until ``min_errors`` bit errors or ``max_bits`` decoded.

    ``decode(symbols [B, T*R]) -> bytes [B, N]`` defaults to the fused jnp
    pipeline; pass a Pallas-backed decoder for the configs where the kernel
    route is decisively faster (K=24 is ~15x -- Monte-Carlo at its
    operating points is otherwise impractical)."""
    if decode is None:
        def decode(syms):
            return decode_symbols(code, numeric, syms, frame_bytes * 8)
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    bits = errors = frames = frame_errors = 0
    while errors < min_errors and bits < max_bits:
        key, sub = jax.random.split(key)
        data = rng.integers(0, 256, size=(batch, frame_bytes), dtype=np.uint8)
        syms = awgn_symbols(code, numeric, sub, jnp.asarray(data), ebn0_db)
        out = np.asarray(decode(syms))
        frame_err = (out != data).any(axis=1)
        errors += count_bit_errors(out, data)
        frame_errors += int(frame_err.sum())
        frames += batch
        bits += batch * frame_bytes * 8
    return BerPoint(ebn0_db, bits, errors, frames, frame_errors)


def ber_curve(
    code: CodeSpec,
    numeric: NumericSpec,
    ebn0_points: list[float],
    **kwargs,
) -> list[BerPoint]:
    return [measure_ber(code, numeric, p, **kwargs) for p in ebn0_points]
