"""Phase-timed benchmarking.

Reproduces the reference's measurement methodology (ref: src/main.cpp:239-282):
each iteration times the three lifecycle phases separately --
reset / update(symbols) / chainback -- and the loop runs until BOTH a
wall-clock budget and a minimum sample count are exceeded
(ref: src/main.cpp:257-259; defaults 1.0 s / 8 samples, src/main.cpp:300-310).
Raw per-iteration nanosecond samples are kept, not aggregates
(ref: src/main.cpp:99-108); statistics happen downstream in the analysis
scripts exactly as in the reference.

On TPU a "phase" is a jitted program.  Because some transports acknowledge
``block_until_ready`` before execution finishes and add a large constant
per-call cost, every device-phase sample is a MARGINAL chained measurement
(see ``run_phase_bench``); ``sync`` forces a scalar host fetch so no timing
can complete early.  The batch axis B means one iteration decodes B frames,
so the JSON bookkeeping counts B x frame sizes -- the schema stays valid for
the reference's analysis scripts.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CodeSpec, NumericSpec
from ..ops import acs, chainback as cb
from ..utils.bits import count_bit_errors

__all__ = ["PhaseSample", "BenchResult", "run_phase_bench", "time_update_phase", "sync"]


def sync(tree):
    """Force full device-side completion of every array in ``tree``.

    ``block_until_ready`` alone is used first, but some experimental PJRT
    transports acknowledge readiness before execution finishes; fetching one
    scalar element of each output to the host cannot complete early, so phase
    timings built on this are honest everywhere.
    """
    tree = jax.tree.map(jax.block_until_ready, tree)
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            idx = tuple([-1] * leaf.ndim)
            np.asarray(leaf[idx])
    return tree


@dataclasses.dataclass
class PhaseSample:
    init_ns: int
    update_ns: int
    chainback_ns: int


@dataclasses.dataclass
class BenchResult:
    name: str
    code: CodeSpec
    batch: int
    frame_bytes: int
    sampling_time: float
    minimum_samples: int
    samples: list[PhaseSample]
    total_bit_errors: int

    @property
    def total_input_bytes(self) -> int:
        return self.batch * self.frame_bytes

    @property
    def total_transmit_bits(self) -> int:
        return self.batch * self.code.transmit_bits(self.frame_bytes)

    @property
    def total_output_symbols(self) -> int:
        return self.batch * self.code.total_symbols(self.frame_bytes)

    @property
    def total_bits(self) -> int:
        return self.total_input_bytes * 8

    def to_json_obj(self) -> dict:
        """Reference-schema JSON object (ref: print_test, src/main.cpp:80-118)."""
        return {
            "name": self.name,
            "K": self.code.K,
            "R": self.code.R,
            "poly": list(self.code.polys),
            "total_input_bytes": self.total_input_bytes,
            "total_transmit_bits": self.total_transmit_bits,
            "total_output_symbols": self.total_output_symbols,
            "sampling_time": self.sampling_time,
            "minimum_samples": self.minimum_samples,
            "total_samples": len(self.samples),
            "init_ns": [s.init_ns for s in self.samples],
            "update_ns": [s.update_ns for s in self.samples],
            "chainback_ns": [s.chainback_ns for s in self.samples],
            "total_bits": self.total_bits,
            "total_bit_errors": self.total_bit_errors,
            "bit_error_rate": self.total_bit_errors / float(self.total_bits),
        }


def _phases_for_backend(code: CodeSpec, numeric: NumericSpec, backend: str,
                        num_data_bits: int, batch: int | None = None):
    """Return (init_fn, update_fn, chainback_fn) jittables for a backend."""
    if backend == "pallas":
        from ..ops.pallas import dispatch

        return dispatch.phase_fns(code, numeric, num_data_bits, batch)

    if backend == "native":
        from ..utils import native as native_mod

        decoders: list = []

        def init_fn(batch: int):
            if not decoders:
                decoders.extend(
                    native_mod.HostDecoder(code, numeric, max_steps=0)
                    for _ in range(batch)
                )
            for d in decoders:
                d.reset()
            return None

        def update_fn(metrics, sym_np):
            for d, s in zip(decoders, sym_np):
                d.update(s)
            return None, None, None

        def chainback_fn(words):
            return np.stack([d.chainback(num_data_bits // 8)[0] for d in decoders])

        def prepare_fn(symbols):
            return np.ascontiguousarray(np.asarray(symbols), dtype=np.int32)

        return init_fn, update_fn, chainback_fn, prepare_fn, None, None

    # Always fuse penalty computation into the scan body: materialising
    # whole-frame penalties is O(T*B*2S) memory (17 GB for K=15 at B=64).
    fused = True
    # Portable-path routing: mid-size trellises run the rotating-address
    # formulation (``acs.acs_update_rotating`` + position-packed traceback)
    # -- measured 1.9x the natural scan at K=15 B=256 on v5e (the natural
    # body re-interleaves the [B, S] metric tensor at element granularity
    # every step).  Small K keeps the natural scan (already winning cells);
    # K=24 cannot compile the rotating gathers (HBM OOM -- see
    # ``acs_update_rotating``'s routing note).
    use_rot = 10 <= code.K <= 15

    def _update(metrics, symbols):
        if use_rot:
            return acs.acs_update_rotating(code, numeric, metrics, symbols, 0)
        return acs.acs_update(code, numeric, metrics, symbols, fused)

    def _cb(words, endstate):
        return cb.chainback(code, words, num_data_bits, endstate, use_rot)

    def init_fn(batch: int):
        return acs.init_metrics(code, numeric, batch)

    def update_fn(metrics, symbols):
        return _update(metrics, symbols)

    def chainback_fn(words):
        return _cb(words, 0)

    def prepare_fn(symbols):
        return jax.block_until_ready(symbols.astype(jnp.int32))

    def make_chainback_chain(k):
        # Data-dependent links (endstate from previous output) so XLA can
        # neither CSE nor dead-code them; fori_loop keeps compile time
        # independent of k.
        @jax.jit
        def run(words):
            out0 = _cb(words, jnp.int32(0))

            def body(_, carry):
                es, prev = carry
                out = _cb(words, es)
                return out[0, -1].astype(jnp.int32), out

            _, out = jax.lax.fori_loop(
                0, k - 1, body, (out0[0, -1].astype(jnp.int32), out0)
            )
            return out

        return run

    def make_update_chain(k):
        @jax.jit
        def run(metrics, symbols):
            m, w, _ = _update(metrics, symbols)

            def body(_, carry):
                m, w = carry
                m2, w2, _ = _update(m, symbols)
                return (m2, w2)

            return jax.lax.fori_loop(0, k - 1, body, (m, w))

        return run

    return (init_fn, update_fn, chainback_fn, prepare_fn,
            make_chainback_chain, make_update_chain)


def run_phase_bench(
    code: CodeSpec,
    numeric: NumericSpec,
    data: np.ndarray,
    symbols: jnp.ndarray,
    name: str = "tpu_jnp",
    backend: str = "jnp",
    sampling_time: float = 1.0,
    minimum_samples: int = 8,
) -> BenchResult:
    """Benchmark one (code, numeric, backend) combo over pre-encoded frames.

    ``data``: [B, N] uint8 originals; ``symbols``: [B, T*R] on device.
    """
    B, n_bytes = data.shape
    symbols = symbols.reshape(B, -1, code.R).astype(jnp.int32)
    num_data_bits = n_bytes * 8
    (init_fn, update_fn, chainback_fn, prepare_fn, make_cb_chain,
     make_up_chain) = _phases_for_backend(code, numeric, backend,
                                          num_data_bits, B)
    symbols = prepare_fn(symbols)  # backend-native staging, untimed
    # Warm-up / compile all three phases once.
    metrics = sync(init_fn(B))
    _, words, _ = sync(update_fn(metrics, symbols))
    out = sync(chainback_fn(words))

    # Phase timing.  Device backends go through a transport whose per-call
    # fetch cost (tens of ms on tunneled dev rigs) would swamp the phase
    # times, so each sample is the MARGINAL cost of extending a chain of
    # k phase executions from 1 to n -- the constant fetch cost cancels.
    # The chain is data-dependent for update (metrics feed forward);
    # init/chainback links are independent dispatches executed in stream
    # order.  The native backend runs on the host and is timed directly.
    n_chain = 4 if backend != "native" else 1
    # Chainback and update chains run IN-jit (varied endstates / forwarded
    # metrics defeat CSE) so the marginal is pure device time even for
    # sub-ms phases.  Both ends of each difference are LONG chains: per-call
    # dispatch noise is identical on both and the link-count denominator
    # divides what remains.  Chain lengths are ADAPTIVE: the extension
    # ((hi-lo links) x per-link time) must clear this rig's transport-jitter
    # spikes (10-50 ms) by an order of magnitude, or the subtraction
    # collapses into the floor clamp -- with the in-place kernels, K<=9
    # updates run ~0.5-1 ms per link, so a fixed 12-link extension (~10 ms)
    # is jitter-sized and the matrix emits 1 us-floor garbage.  Lengths are
    # probed per row and rounded up to powers of two (stable across runs ->
    # the persistent jit cache keeps re-runs cheap; fori_loop chains make
    # compile time k-independent).
    EXT_TARGET_NS = 120e6  # pure-device extension to aim for per marginal
    MAX_LINKS = 1024

    up_chains: dict = {}
    cb_chains: dict = {}

    def get_up_chain(k):
        if k not in up_chains:
            up_chains[k] = make_up_chain(k)
            sync(up_chains[k](metrics, symbols))  # compile outside samples
        return up_chains[k]

    def get_cb_chain(k):
        if k not in cb_chains:
            cb_chains[k] = make_cb_chain(k)
            sync(cb_chains[k](words))
        return cb_chains[k]

    n_cb_lo, n_cb_hi = (16, 128) if make_cb_chain is not None else (1, 1)
    n_up_lo, n_up_hi = (2, 14) if make_up_chain is not None else (1, n_chain)

    def run_init(k):
        t0 = time.perf_counter_ns()
        m = None
        for _ in range(k):
            m = init_fn(B)
        sync(m)
        return time.perf_counter_ns() - t0, m

    def run_update(k, m0):
        t0 = time.perf_counter_ns()
        if make_up_chain is not None:
            m, w = up_chains[k](m0, symbols)
        else:
            m, w = m0, None
            for _ in range(k):
                m, w, _ = update_fn(m, symbols)
        sync(w)
        return time.perf_counter_ns() - t0, w

    def run_chainback(k, w):
        t0 = time.perf_counter_ns()
        if make_cb_chain is not None:
            o = cb_chains[k](w)
        else:
            o = None
            for _ in range(k):
                o = chainback_fn(w)
        sync(o)
        return time.perf_counter_ns() - t0, o

    def _pow2_at_least(n: float) -> int:
        p = 1
        while p < n:
            p *= 2
        return p

    def _probe_marginal(run, k_lo, k_hi, *args) -> float:
        t_lo = min(run(k_lo, *args)[0], run(k_lo, *args)[0])
        t_hi = min(run(k_hi, *args)[0], run(k_hi, *args)[0])
        return (t_hi - t_lo) / (k_hi - k_lo)

    # Per-link times above jitter spikes are trusted from a 2-link cheap
    # probe; slow phases (K=24/K=15 jnp links run 0.4-2 s) then use the
    # SHORTEST chain whose extension clears the target, instead of paying a
    # fixed 14-link chain (26 s per measurement for the K=24 scan).
    TRUST_NS = 60e6

    def _size_chain(run, get_chain, k_lo, k_hi_default, *args):
        get_chain(k_lo), get_chain(k_lo + 2)
        per_cheap = _probe_marginal(run, k_lo, k_lo + 2, *args)
        if per_cheap >= TRUST_NS:
            # ext >= 2 reuses the already-compiled k_lo+2 chain.
            ext = max(2, _pow2_at_least(EXT_TARGET_NS / per_cheap))
            k_hi = min(k_lo + ext, k_hi_default)
            get_chain(k_hi)
            return k_hi
        get_chain(k_hi_default)
        per_link = max(
            _probe_marginal(run, k_lo, k_hi_default, *args),
            1_000.0)  # a floored probe maxes out the chain
        want = k_lo + EXT_TARGET_NS / per_link
        if want > k_hi_default:
            k_hi_default = min(MAX_LINKS, _pow2_at_least(want))
            get_chain(k_hi_default)
        return k_hi_default

    if make_up_chain is not None:
        n_up_hi = _size_chain(run_update, get_up_chain, n_up_lo, n_up_hi,
                              metrics)
    if make_cb_chain is not None:
        n_cb_hi = _size_chain(run_chainback, get_cb_chain, n_cb_lo, n_cb_hi,
                              words)

    samples: list[PhaseSample] = []
    floor_retries = 6  # failed-marginal re-measures before giving up
    t_start = time.perf_counter()
    while (time.perf_counter() - t_start) < sampling_time or len(samples) < minimum_samples:
        if n_chain == 1:
            ti, metrics = run_init(1)
            tu, words = run_update(1, metrics)
            tc, out = run_chainback(1, words)
            samples.append(PhaseSample(ti, tu, tc))
        else:
            # Contention on this time-shared chip can only ever INFLATE a raw
            # measurement, so the defensible estimator of each chain's true
            # device time is the MIN over repeats of that RAW endpoint -- and
            # the marginal is formed ONCE from the two minima.  (Min-of-3 of
            # the *difference* is wrong: a contention spike on the short-chain
            # baseline shrinks the difference, and the min then selects
            # exactly the most-contended baseline -- observed as impossible
            # 137 Gbit/s chainback rates in matrix runs.)
            raw = None
            for _ in range(3):
                ti1, metrics = run_init(1)
                tin, _ = run_init(n_chain)
                tu1, _ = run_update(n_up_lo, metrics)
                tun, words = run_update(n_up_hi, metrics)
                tc1, _ = run_chainback(n_cb_lo, words)
                tcn, out = run_chainback(n_cb_hi, words)
                cur = (ti1, tin, tu1, tun, tc1, tcn)
                raw = cur if raw is None else tuple(map(min, raw, cur))
            ti1, tin, tu1, tun, tc1, tcn = raw
            d = n_chain - 1
            floor = 1_000
            mu = (tun - tu1) // (n_up_hi - n_up_lo)
            mc = (tcn - tc1) // (n_cb_hi - n_cb_lo)
            # A device marginal at or below zero means a jitter spike ate the
            # whole chain extension: the MEASUREMENT failed, the phase did not
            # run in 0 ns.  Emitting the 1 us resolution floor instead poisons
            # the row downstream (one floored sample in 8 tabulates as an
            # impossible ~100x-mean rate with std > mean).  So a floored
            # update/chainback marginal DISCARDS the sample and doubles the
            # offending chain (a longer extension rises above the spikes);
            # only after the growth budget is exhausted is the floor recorded,
            # keeping termination guaranteed.
            if (mu <= 0 or mc <= 0) and floor_retries > 0:
                floor_retries -= 1
                if mu <= 0 and n_up_hi < MAX_LINKS:
                    n_up_hi = min(2 * n_up_hi, MAX_LINKS)
                    get_up_chain(n_up_hi)
                if mc <= 0 and n_cb_hi < MAX_LINKS:
                    n_cb_hi = min(2 * n_cb_hi, MAX_LINKS)
                    get_cb_chain(n_cb_hi)
                continue
            samples.append(PhaseSample(
                max((tin - ti1) // d, floor),
                max(mu, floor),
                max(mc, floor),
            ))

    # The timing chain's last link traces back from a nonzero endstate (CSE
    # defeat); recompute the real output for the correctness check.
    out = sync(chainback_fn(words))
    errors = count_bit_errors(np.asarray(out), data)
    return BenchResult(
        name=name,
        code=code,
        batch=B,
        frame_bytes=n_bytes,
        sampling_time=sampling_time,
        minimum_samples=minimum_samples,
        samples=samples,
        total_bit_errors=errors,
    )


def time_update_marginal(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    backend: str = "pallas",
    n_chain: int = 5,
    iters: int = 3,
) -> float:
    """Honest device throughput (symbols/s) of the symbol-update phase.

    Times a jitted chain of ``n_chain`` data-dependent update calls against a
    single call and reports the marginal cost -- per-call host/dispatch
    overhead (large on tunneled PJRT transports) cancels in the difference.
    """
    from ..ops.pallas import dispatch
    from ..ops.pallas import inplace as pli
    from ..ops.pallas import kernels as plk

    B, T, R = symbols.shape[0], symbols.shape[1] // 1, code.R
    symbols = symbols.reshape(B, -1, code.R).astype(jnp.int32)
    T = symbols.shape[1]

    Bp = -(-B // 128) * 128
    use_pallas = backend == "pallas" and dispatch.supports(code) and dispatch.on_tpu()
    if backend == "pallas" and dispatch.on_tpu() and dispatch.use_inplace(code, Bp):
        # In-place rotating-address family (the routed default at full lane
        # groups): metrics [S, B], symbols [Tp, R, B], whole frames (t0=0).
        Tp = pli.pad_time_inplace(code, T, Bp)
        sym_native = jax.block_until_ready(
            jnp.pad(symbols, ((0, Bp - B), (0, Tp - T), (0, 0))).transpose(1, 2, 0))
        m0 = acs.init_metrics(code, numeric, Bp).T

        def chain(n):
            @jax.jit
            def run(m, sym):
                m, dec = pli.acs_update_inplace(
                    code, numeric, m, sym, T, 0, False)

                def body(_, carry):
                    m, dec = carry
                    return pli.acs_update_inplace(
                        code, numeric, m, sym, T, 0, False)

                return jax.lax.fori_loop(0, n - 1, body, (m, dec))

            return lambda: run(m0, sym_native)
    elif use_pallas:
        TBk = plk.pick_time_block(code, Bp)
        Tp = -(-T // TBk) * TBk
        sym_native = jax.block_until_ready(
            jnp.pad(symbols, ((0, Bp - B), (0, Tp - T), (0, 0))).transpose(1, 2, 0))
        m0 = acs.init_metrics(code, numeric, Bp).T

        def chain(n):
            @jax.jit
            def run(m, sym):
                m, dec = plk.acs_update_tb(code, numeric, m, sym, T)

                def body(_, carry):
                    m, dec = carry
                    return plk.acs_update_tb(code, numeric, m, sym, T)

                return jax.lax.fori_loop(0, n - 1, body, (m, dec))

            return lambda: run(m0, sym_native)
    else:
        m0 = acs.init_metrics(code, numeric, B)

        def chain(n):
            @jax.jit
            def run(m, sym):
                m, w, _ = acs.acs_update(code, numeric, m, sym, True)

                def body(_, carry):
                    m, w = carry
                    m2, w2, _ = acs.acs_update(code, numeric, m, sym, True)
                    return (m2, w2)

                return jax.lax.fori_loop(0, n - 1, body, (m, w))

            return lambda: run(m0, symbols)

    def timed(fn):
        t0 = time.perf_counter()
        sync(fn())
        return time.perf_counter() - t0

    c1, cn = chain(1), chain(n_chain)
    sync(c1())  # compile + warm
    sync(cn())
    # Paired samples; median marginal rides out transport jitter and
    # transient chip contention.
    margs = []
    for _ in range(max(iters, 3)):
        t1 = min(timed(c1), timed(c1))
        tn = min(timed(cn), timed(cn))
        margs.append(max((tn - t1) / (n_chain - 1), 1e-9))
    marg = float(np.median(margs))
    return B * T * code.R / marg


def time_update_phase(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    iters: int = 5,
    backend: str = "jnp",
) -> float:
    """Median symbol-update throughput (symbols/s) over ``iters`` timed runs."""
    B = symbols.shape[0]
    symbols = symbols.reshape(B, -1, code.R).astype(jnp.int32)
    T = symbols.shape[1]
    init_fn, update_fn, _, prepare_fn, _, _ = _phases_for_backend(
        code, numeric, backend, 8, B)
    symbols = prepare_fn(symbols)
    metrics = sync(init_fn(B))
    jax.tree.map(jax.block_until_ready, update_fn(metrics, symbols))  # compile

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(update_fn(metrics, symbols))
        times.append(time.perf_counter() - t0)
    total_symbols = B * T * code.R
    return total_symbols / float(np.median(times))
