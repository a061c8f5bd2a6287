"""Collective-traffic accounting for the multi-chip decode paths.

The reference has no communication at all (SURVEY §2.3: strictly sequential
``main()``, SIMD-only parallelism), so the multi-chip axes are new
first-class components here -- and their cost model should be evidence, not
intent.  This module provides both halves:

* **Measured**: :func:`collective_trace` walks the jaxpr of a sharded decode
  (through ``shard_map``/``scan``/``pjit`` bodies, multiplying by scan trip
  counts) and returns every collective with its per-shard payload, pair
  count, and wire bytes.  Tests pin these measurements to the analytic model
  on the virtual CPU mesh -- the collective *sizes and counts* are exactly
  what XLA will schedule on real ICI; only the link speed is simulated.

* **Analytic** (:func:`statewise_model`, :func:`timeblock_model`,
  :func:`frame_model`): closed-form per-step ICI bytes and a predicted
  scaling efficiency under stated hardware assumptions (defaults: one
  v5e-class chip, HBM 819 GB/s, aggregate per-chip ICI egress 180 GB/s =
  4 links x 45 GB/s).

The north-star claim this quantifies (BASELINE.md:90: >= 85 % scaling
efficiency for frame + time-block sharding):

* **frame DP** moves ZERO bytes between devices -- the jaxpr contains no
  collectives (pinned by test) -- so scaling efficiency is bounded only by
  host dispatch imbalance, predicted ~100 %.
* **time-block SP** exchanges one halo of ``overlap * R`` symbol groups per
  block boundary, once per frame -- amortised over ``T_block`` trellis steps
  of ACS it is < 0.1 % of step time for any realistic block (model below),
  predicted > 99 %.
* **state sharding** (K=24 capacity axis, NOT part of the north-star claim)
  is honestly ICI-bound: every trellis step must move one metric vector
  copy over the wire (4*B*S/n bytes egress per device -- the butterfly's
  bisection, irreducible for any static state partition since every new
  metric depends on one local and one remote half), and with HBM ~4.5x
  faster than ICI per chip the predicted per-step scaling efficiency is
  ~45 %.  It exists to fit 2^23-state metrics + per-bit decisions in VMEM/
  HBM budgets (ref: viterbi224_sse2.cpp:14-20), not to win throughput per
  chip; tests pin its measured wire bytes to the model exactly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CodeSpec

__all__ = [
    "Collective",
    "CommsReport",
    "collective_trace",
    "statewise_model",
    "timeblock_model",
    "state_time_model",
    "frame_model",
    "HBM_BYTES_PER_S",
    "ICI_EGRESS_BYTES_PER_S",
]

# Stated hardware assumptions: device-derived from the attached chip
# (utils/chipinfo.py), falling back to the TPU v5e datasheet figures used
# throughout ARCHITECTURE.md's roofline table (HBM 819 GB/s; ICI = 4 links
# x 45 GB/s per direction, 2-D torus) when run off-TPU.  Resolved lazily
# (PEP 562) so importing this module never initializes the JAX backend as
# a side effect -- chip detection touches jax.devices(), which must not
# run before e.g. jax.distributed.initialize() in multi-process programs.
def __getattr__(name: str):
    if name in ("HBM_BYTES_PER_S", "ICI_EGRESS_BYTES_PER_S"):
        from ..utils.chipinfo import chip_info

        info = chip_info()
        return (info.hbm_bytes_per_s if name == "HBM_BYTES_PER_S"
                else info.ici_egress_bytes_per_s)
    raise AttributeError(name)

_COLLECTIVES = {
    "ppermute", "psum", "psum2", "psum_invariant", "pmin", "pmax",
    "all_gather", "all_to_all", "reduce_scatter",
}


@dataclass
class Collective:
    prim: str
    shape: tuple
    dtype: str
    payload_bytes: int      # one shard's payload (bytes leaving one source)
    pairs: int              # ppermute: # (src, dst) pairs; reductions: axis size
    count: int              # executions (scan trip counts multiplied through)
    axes: tuple

    @property
    def wire_bytes(self) -> int:
        """Total bytes crossing links per execution (ppermute: every pair
        ships one payload; reductions: ring all-reduce moves ~2(n-1)/n
        payloads per participant -- reported as the logical lower bound
        n * payload for simplicity, flagged by ``prim``)."""
        return self.payload_bytes * self.pairs


@dataclass
class CommsReport:
    collectives: list[Collective] = field(default_factory=list)

    def total_wire_bytes(self, prim_prefix: str = "") -> int:
        return sum(c.wire_bytes * c.count for c in self.collectives
                   if c.prim.startswith(prim_prefix))

    def total_count(self, prim_prefix: str = "") -> int:
        return sum(c.count for c in self.collectives
                   if c.prim.startswith(prim_prefix))

    def to_json_obj(self) -> dict:
        return {
            "collectives": [
                {"prim": c.prim, "shape": list(c.shape), "dtype": c.dtype,
                 "payload_bytes": c.payload_bytes, "pairs": c.pairs,
                 "count": c.count, "axes": list(c.axes),
                 "wire_bytes": c.wire_bytes}
                for c in self.collectives
            ],
            "total_wire_bytes": self.total_wire_bytes(),
        }


def _sub_jaxprs(params):
    for v in params.values():
        vals = v if isinstance(v, (tuple, list)) else (v,)
        for x in vals:
            if hasattr(x, "eqns"):
                yield x
            elif hasattr(x, "jaxpr") and hasattr(x.jaxpr, "eqns"):
                yield x.jaxpr


def collective_trace(fn, *args, **kwargs) -> CommsReport:
    """Trace ``fn(*args)`` and account every collective in its jaxpr.

    Walks nested jaxprs (``shard_map``, ``scan`` -- multiplied by trip
    count, ``pjit``, ``cond`` branches -- counted once each as an upper
    bound on any single execution path).
    """
    jaxpr = jax.make_jaxpr(functools.partial(fn, **kwargs))(*args)
    report = CommsReport()

    def walk(jx, mult: int):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in _COLLECTIVES:
                aval = eqn.outvars[0].aval
                payload = int(np.prod(aval.shape)) * aval.dtype.itemsize
                if name == "ppermute":
                    pairs = len(eqn.params.get("perm", ()))
                else:
                    pairs = 1  # reductions: payload per participant
                raw = eqn.params.get("axes") or eqn.params.get("axis_name")
                raw = raw if isinstance(raw, (tuple, list)) else (raw,)
                axes = []
                for a in raw:  # ppermute nests its axis_name one level deep
                    axes.extend(a if isinstance(a, (tuple, list)) else (a,))
                report.collectives.append(Collective(
                    prim=name, shape=tuple(aval.shape), dtype=str(aval.dtype),
                    payload_bytes=payload, pairs=pairs, count=mult,
                    axes=tuple(a for a in axes if a is not None),
                ))
            m = mult * (eqn.params["length"] if name == "scan" else 1)
            for sj in _sub_jaxprs(eqn.params):
                walk(sj, m)

    walk(jaxpr.jaxpr, 1)
    return report


# ---------------------------------------------------------------------------
# Analytic models.  All byte counts are per FRAME-BATCH (B frames decoded
# together), int32 metrics/symbols as the sharded jnp paths use.
# ---------------------------------------------------------------------------


def statewise_model(code: CodeSpec, n_state: int, B: int, T: int,
                    hbm: float | None = None,
                    ici: float | None = None) -> dict:
    """State-sharded update (parallel/statewise.py).

    Per trellis step the butterfly exchange runs 4 half-shard ppermutes of
    ``[B, chunk]`` int32 (chunk = S/2n), n/2 pairs each: total wire bytes =
    4 * (n/2) * 4*B*chunk = one full metric-vector copy (4*B*S bytes); per-
    device egress = 4*B*S/n.  That is the bisection lower bound -- every new
    metric needs one local and one remote predecessor half under any static
    state partition -- so the model is exact, not an estimate (pinned to the
    jaxpr by tests).

    Efficiency: per device per step, compute-side HBM traffic = read old
    shard + write new shard + packed decisions ~ (4+4+1/8)*B*S/n bytes; wire
    = 4*B*S/n at the slower ICI.  Perfect overlap gives
    ``eff = t_hbm / max(t_hbm, t_ici)``.
    """
    hbm = hbm if hbm is not None else __getattr__("HBM_BYTES_PER_S")
    ici = ici if ici is not None else __getattr__("ICI_EGRESS_BYTES_PER_S")
    S = code.num_states
    chunk = S // (2 * n_state)
    step_wire = 4 * (n_state // 2 if n_state > 1 else 0) * (4 * B * chunk)
    egress_dev = step_wire / max(n_state, 1)
    hbm_dev = (8 + 0.125) * B * S / n_state
    t_hbm = hbm_dev / hbm
    t_ici = egress_dev / ici
    eff = 1.0 if step_wire == 0 else t_hbm / max(t_hbm, t_ici)
    # Traceback: one psum of [B] int32 per step (latency-, not bw-bound).
    return {
        "axis": "state", "n": n_state, "B": B, "T": T,
        "step_wire_bytes": step_wire,
        "step_egress_bytes_per_device": egress_dev,
        "update_ppermutes": 4 * T,
        "traceback_psums": T,
        "traceback_psum_bytes": 4 * B,
        "predicted_step_efficiency": eff,
    }


def timeblock_model(code: CodeSpec, n_time: int, B: int, T: int,
                    overlap: int | None = None,
                    hbm: float | None = None,
                    ici: float | None = None) -> dict:
    """Time-block SP (parallel/timeblock.py): two one-shot symbol-halo
    ppermutes of ``[B, overlap, R]`` int32 per frame (not per step), plus
    ``overlap`` extra warm-up ACS steps per device.

    Efficiency has two terms: redundant warm-up compute
    ``Tb / (Tb + 2*overlap)`` (the halo is re-decoded), and the one-shot
    wire time amortised over the block's ACS -- negligible (<0.1 %) for any
    realistic block, so the warm-up term dominates.
    """
    from .. import parallel

    hbm = hbm if hbm is not None else __getattr__("HBM_BYTES_PER_S")
    ici = ici if ici is not None else __getattr__("ICI_EGRESS_BYTES_PER_S")
    if overlap is None:
        overlap = parallel.default_overlap(code)
    Tb = T // n_time
    halo_payload = 4 * B * overlap * code.R
    wire = 2 * (n_time - 1) * halo_payload
    # ACS step cost (single-device, HBM side): metrics read+write ~ 8*B*S.
    t_block = (Tb + 2 * overlap) * 8 * B * code.num_states / hbm
    t_wire = (2 * halo_payload / ici) if n_time > 1 else 0.0
    eff_warmup = Tb / (Tb + 2 * overlap)
    eff = eff_warmup * t_block / (t_block + t_wire)
    return {
        "axis": "time", "n": n_time, "B": B, "T": T, "overlap": overlap,
        "halo_ppermutes": 2,
        "halo_payload_bytes": halo_payload,
        "total_wire_bytes": wire,
        "predicted_efficiency": eff,
        "warmup_share": 1 - eff_warmup,
    }


def state_time_model(code: CodeSpec, n_state: int, n_time: int, B: int,
                     T: int, overlap: int | None = None) -> dict:
    """Composed mesh (parallel/state_time.py): statewise per-step exchange
    inside every block x timeblock one-shot halos; tracebacks block-local
    (``Tb + overlap`` psums instead of T)."""
    from .. import parallel

    if overlap is None:
        overlap = parallel.default_overlap(code)
    Tb = T // n_time
    sw = statewise_model(code, n_state, B, Tb + 2 * overlap)
    tb = timeblock_model(code, n_time, B, T, overlap)
    return {
        "axes": ("state", "time"), "n_state": n_state, "n_time": n_time,
        "B": B, "T": T, "overlap": overlap,
        "step_wire_bytes": sw["step_wire_bytes"],
        "update_ppermutes_per_device_stream":
            4 * (Tb + 2 * overlap),  # warm-up + main scans
        "halo_payload_bytes": tb["halo_payload_bytes"],
        "traceback_psums": Tb + overlap,
        "predicted_efficiency":
            sw["predicted_step_efficiency"] * tb["predicted_efficiency"],
    }


def frame_model(n_frame: int, B: int) -> dict:
    """Frame DP (parallel/frame.py): zero collectives (pinned by test);
    scaling bounded only by dispatch imbalance."""
    return {"axis": "frame", "n": n_frame, "B": B, "total_wire_bytes": 0,
            "predicted_efficiency": 1.0}
