"""Device-derived hardware constants (VERDICT r4 item 7).

Every routing predicate and roofline in the framework used hardcoded
TPU v5e numbers (``kernels.VMEM_CAP = 110 MiB``, ``comms.HBM_BYTES_PER_S
= 819e9``); on another TPU generation those were silently wrong.  This
module is the single source: it detects the attached chip from
``jax.devices()[0].device_kind`` and serves that generation's public
datasheet figures, falling back to the v5e numbers (flagged ``assumed``)
on CPU or an unrecognized kind.

Figures are the public scaling-book / datasheet numbers per generation;
``vmem_usable`` leaves the same headroom below the 128 MiB physical VMEM
that the v5e kernels were tuned with (compiler scoped allocations).
"""

from __future__ import annotations

import dataclasses
import functools

__all__ = ["ChipInfo", "chip_info", "detect_kind"]


@dataclasses.dataclass(frozen=True)
class ChipInfo:
    name: str                    # canonical generation name
    device_kind: str             # matched jax device_kind ("" if assumed)
    vmem_bytes: int              # physical VMEM per core
    vmem_usable: int             # budget the kernels may plan against
    hbm_bytes_per_s: float       # HBM bandwidth per chip
    ici_egress_bytes_per_s: float  # aggregate per-chip ICI egress
    clock_hz: float              # core clock (roofline VPU peak derivation)
    assumed: bool                # True = fallback, not detected hardware


def _mk(name, kind, hbm, ici, clock):
    phys = 128 * 1024 * 1024
    return ChipInfo(
        name=name, device_kind=kind,
        vmem_bytes=phys, vmem_usable=110 * 1024 * 1024,
        hbm_bytes_per_s=hbm, ici_egress_bytes_per_s=ici,
        clock_hz=clock, assumed=False)


# substring of jax device_kind (lowercased) -> figures.  Order matters:
# first match wins (e.g. "v5 lite" before "v5").
_KNOWN: list[tuple[str, ChipInfo]] = [
    ("v5 lite", _mk("v5e", "TPU v5 lite", 819e9, 180e9, 940e6)),
    ("v5e", _mk("v5e", "TPU v5e", 819e9, 180e9, 940e6)),
    ("v5p", _mk("v5p", "TPU v5p", 2765e9, 540e9, 1750e6)),
    ("v5", _mk("v5p", "TPU v5", 2765e9, 540e9, 1750e6)),
    ("v6 lite", _mk("v6e", "TPU v6 lite", 1640e9, 180e9, 1575e6)),
    ("v6e", _mk("v6e", "TPU v6e", 1640e9, 180e9, 1575e6)),
    ("v4", _mk("v4", "TPU v4", 1228e9, 270e9, 1050e6)),
]

_FALLBACK = dataclasses.replace(
    _mk("v5e", "", 819e9, 180e9, 940e6), assumed=True)


def detect_kind() -> str | None:
    """The attached accelerator's device_kind, or None off-TPU.  Never
    initializes a new backend by itself beyond what jax.devices() does."""
    try:
        import jax

        dev = jax.devices()[0]
        if dev.platform != "tpu":
            return None
        return dev.device_kind
    except Exception:  # noqa: BLE001 - no backend at all
        return None


@functools.lru_cache(maxsize=1)
def chip_info() -> ChipInfo:
    """Figures for the attached chip (cached); v5e-assumed off-TPU."""
    kind = detect_kind()
    if kind:
        low = kind.lower()
        for sub, info in _KNOWN:
            if sub in low:
                return dataclasses.replace(info, device_kind=kind)
        # Unknown TPU generation: keep the fallback numbers but make the
        # mismatch loud for roofline consumers.
        return dataclasses.replace(_FALLBACK, device_kind=kind)
    return _FALLBACK
