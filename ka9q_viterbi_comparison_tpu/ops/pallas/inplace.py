"""In-place ACS kernel with rotating state addressing (mid-size trellises).

The plain VMEM-resident kernel (``kernels.py``) pays a full sublane
interleave of the ``[S, B]`` metric array every trellis step -- for K=15's
16384 sublane rows that relayout dominates the step (measured: the
whole-frame VMEM kernel is *slower* than the HBM-streamed ``large_k2`` at
K=15, ``tools/k15_vmem_probe.py``).  This kernel removes the interleave
entirely with the classic in-place trick (the FFT-style address rotation):

    store the metric of state ``s`` at position ``rotr(s, t mod (K-1))``
    at trellis step ``t`` (bit-rotation within the K-1 state bits).

Under that addressing the butterfly becomes in-place: at step ``t`` the
pair read for predecessor half-state ``s2`` sits at positions
``(q, q | 2**j)`` with ``q = rotr(s2, t)`` and ``j = (K-2-t) mod (K-1)``,
and the two new metrics (states ``2*s2+b``) write back to those same two
positions::

    pos_{t+1}(2*s2 + b) = rotr(s2 + b*2**(K-2), t) = q | b*2**j

So each step is: slice the metric array in halves along bit ``j`` of the
position index (a reshape ``[S >> (j+1), 2, 2**j, B]`` -- pure vreg
addressing for ``2**j >= 8``), ACS, write the candidates straight back.
No stack/interleave, no HBM metric traffic, and the decision words leave
bit-packed in *position* order; the chainback kernel maps state to
position with the same rotation (two shifts + or on the ``[1, B]`` state
vector per step).

The phase ``j`` cycles through K-1 static slice patterns, so the time loop
runs in groups of K-1 statically-unrolled steps (time blocks are sized to a
multiple of K-1 and the frame tail is unrolled statically).  Branch
penalties reuse the affine decomposition of ``kernels.py`` but need the
``x = 0`` expected-bit table *in position order per phase*: ``K-1`` small
static tables built once on the host (``[K-1, S/2, R]``; 2.75 MiB for
K=15 -- vs the reference's single state-ordered table,
ref: ka9q_libfec_port/viterbi615_sse2.cpp:100-118).

Blockwise resume: the caller threads the number of trellis steps already
consumed (``t0``); metrics enter/leave in position space of ``t0 mod (K-1)``
(the public dispatch wrapper un/re-rotates to state order at block
boundaries -- one static gather per *call*, amortised over the block).

STATUS: default route for 5 < K <= 15 at padded batch >= 128 (see
``dispatch.use_inplace``).  The original whole-array formulation blew the
Mosaic register allocator (254 MiB of spill slots at K=15 B=128); the
shipped kernel bounds live ranges by processing each phase in fixed
CH-row chunks, and the chunk addresses are expressed as
induction-variable * tile-multiple sums so Mosaic's divisibility analysis
can prove 8-sublane alignment (shift/AND/OR forms of the same address
fail to compile).  Round-4 upgrades, each A/B'd on v5e
(``tools/k15_chunk_sweep.py``): branch-penalty combos evaluate as one
exact bf16 MXU matmul per chunk for S >= 2048 (K=15: 83.5 vs 53.5 Msym/s;
at K=7/9 the matmul overhead loses, so small trellises keep the VPU
combos), the chunk size is 1024, and metrics update IN PLACE via
``input_output_aliases`` (one S x B buffer instead of in + out + scratch
-- K=7 B=512 gains 26 %, 9.2 Gsym/s isolated).  K=15 at B=512 fits VMEM
under the aliased budget but MIS-LOWERS (silently wrong metrics), so
``dispatch.fits_inplace_vmem`` caps the metric tile at the validated
16384 x 256 envelope.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import CodeSpec, NumericSpec
from ..branch import transition_tables
from . import kernels

__all__ = [
    "acs_update_inplace",
    "chainback_inplace",
    "pick_time_block_inplace",
    "pad_time_inplace",
    "rot_perm",
    "CB_TB",
]

CB_TB = 32  # chainback time block (bit-packing wants 32 | TB)

# VMEM budget for the streamed decision blocks of the update kernel
# (double-buffered); metrics + tables are resident on top of this.
DEC_BLOCK_BUDGET = 16 * 1024 * 1024


def _rotl(x, t, nbits):
    if t == 0:
        return x & ((1 << nbits) - 1)
    mask = (1 << nbits) - 1
    return ((x << t) | (x >> (nbits - t))) & mask


def _rotr(x, t, nbits):
    return _rotl(x, (nbits - t) % nbits, nbits)


@functools.lru_cache(maxsize=None)
def _phase_tables_np(code: CodeSpec) -> np.ndarray:
    """``[S/2, (K-1)*R]`` int32, column ``phase*R + r``: expected output bit
    of polynomial ``r`` for the ``h=0, b=0`` combo, with row ``i`` the
    butterfly pair at compressed position ``i`` of that phase (position
    ``q`` with pair bit ``j = (K-2-phase) mod (K-1)`` removed: ``q = (i >>
    j) << (j+1) | (i & (2**j - 1))``, predecessor ``s2 = rotl(q, phase)``).

    Pair-major layout: the phase axis lives in *lanes* (padded to 128), so
    the resident table is ``S/2 x 128`` words (4 MiB at K=15) -- a
    ``[K-1, S/2, R]`` layout would pad R=6 lanes to 128 *per phase*
    (56 MiB)."""
    K = code.K
    nrot = K - 1
    S2 = code.num_states // 2
    e0 = transition_tables(code)[0].astype(np.int32)  # [R, S2], x = h*2+b = 0
    out = np.empty((S2, nrot * code.R), np.int32)
    idx = np.arange(S2, dtype=np.int64)
    for phase in range(nrot):
        j = (K - 2 - phase) % nrot
        q = ((idx >> j) << (j + 1)) | (idx & ((1 << j) - 1))
        s2 = _rotl(q, phase, nrot)
        out[:, phase * code.R : (phase + 1) * code.R] = e0[:, s2].T
    return out


@functools.lru_cache(maxsize=None)
def rot_perm(code: CodeSpec, t: int, inverse: bool = False) -> np.ndarray:
    """State-axis gather indices between state order and position space.

    Forward (``inverse=False``): ``m_pos = m_state[perm]`` for rotation
    phase ``t`` (``perm[q] = rotl(q, t)``).  Inverse: ``m_state =
    m_pos[perm]`` (``perm[s] = rotr(s, t)``)."""
    nrot = code.K - 1
    t = t % nrot
    s = np.arange(code.num_states, dtype=np.int32)
    return (_rotr(s, t, nrot) if inverse else _rotl(s, t, nrot)).astype(np.int32)


def pick_time_block_inplace(code: CodeSpec, batch: int) -> int:
    """Update time block: a multiple of K-1 (every grid block starts at the
    same rotation phase) whose streamed decision blocks fit the budget, and
    aligned with the chainback block so one padded length serves both
    (``lcm(TB, CB_TB)`` stays the padding unit)."""
    W = max(1, code.num_states // 32)
    per_step = (code.R + W) * batch * 4
    groups = max(1, DEC_BLOCK_BUDGET // (2 * per_step * (code.K - 1)))
    return (code.K - 1) * min(groups, 16)


def pad_time_inplace(code: CodeSpec, T: int, batch: int) -> int:
    tb = pick_time_block_inplace(code, batch)
    unit = tb * CB_TB // np.gcd(tb, CB_TB)
    return -(-T // unit) * unit


def _pack_weights(B: int) -> jnp.ndarray:
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    return jax.lax.shift_left(jnp.ones((1, 32, 1), dtype=jnp.int32), j)


@functools.lru_cache(maxsize=None)
def _pack_w_np(CH: int) -> np.ndarray:
    """Banded decision-pack weight matrix for the MXU pack path
    (``KA9Q_TPU_INPLACE_PACK_MXU``): ``w[h, q, 32q+16h+g] = 2^g`` for
    g < 16 -- two 16-bit halves so the f32 accumulator stays exact."""
    w = np.zeros((2, CH // 32, CH), np.float32)
    for q in range(CH // 32):
        for g in range(16):
            w[0, q, 32 * q + g] = float(1 << g)
            w[1, q, 32 * q + 16 + g] = float(1 << g)
    return w


# State-chunk rows processed per inner-loop iteration: bounds Mosaic's live
# ranges (the full-array formulation spilled 254 MiB of registers at K=15).
# Default; the KA9Q_TPU_INPLACE_CHUNK knob overrides (power of two, >= 32).
CHUNK = 512


def _chunk_size(S: int) -> int:
    from . import flags

    ch = flags.inplace_chunk()
    ch = 1 << (ch.bit_length() - 1)  # power of two (address algebra needs it)
    return max(32, min(ch, S))


def _chunk_unroll() -> int:
    """Unroll factor for the per-step chunk loops (trace-time env knob).

    Chunk iterations touch disjoint state rows, so unrolling exposes
    instruction-level parallelism across chunks without growing any live
    range beyond ``unroll`` chunks (the register-spill failure mode was the
    *whole-array* formulation, K-1 phases x 32 chunks live at once)."""
    from . import flags

    return flags.inplace_unroll()


def _loop_chunks(n: int, body) -> None:
    """fori_loop over ``n`` chunk bodies, manually unrolled by the env knob
    (Mosaic's own ``unroll=`` only lowers 1 or num_steps, so partial unroll
    replicates the body with ``cc*u + k`` indices instead)."""
    u = min(_chunk_unroll(), n)
    while n % u:
        u -= 1
    if u <= 1:
        jax.lax.fori_loop(0, n, body, 0, unroll=False)
        return
    if u == n:
        for c in range(n):
            body(c, 0)
        return

    def outer(cc, _):
        for k in range(u):
            body(cc * u + k, 0)
        return 0

    jax.lax.fori_loop(0, n // u, outer, 0, unroll=False)


def _acs_inplace_kernel(code: CodeSpec, numeric: NumericSpec, TB: int,
                        n_last: int, p0: int):
    from . import flags

    S = code.num_states
    S2 = S // 2
    W = max(1, S // 32)
    R = code.R
    K = code.K
    nrot = K - 1
    CH = _chunk_size(S)
    # MXU penalty evaluation pays only when chunks are MXU-sized: at K=7/9
    # (S2 = 32/128 pairs TOTAL) the matmul launch overhead loses 6-12 % on
    # hardware (tools/k15_chunk_sweep.py A/B via SWEEP_CODE), while K=15
    # gains 1.6x -- so the flag additionally gates on trellis size.
    use_mxu = flags.inplace_mxu() and S >= 2048
    use_pack_mxu = flags.inplace_pack_mxu() and S >= 2048
    use_word_pack = flags.inplace_word_pack()
    low = numeric.soft_low
    hl = numeric.soft_high + numeric.soft_low
    # XOR-flip per combo x = h*2+b (identical to kernels.py -- the flips are
    # position-independent, only the e-table rows were reordered).
    flips = []
    for x in range(4):
        h, b = x >> 1, x & 1
        flips.append(tuple(
            ((b & p) ^ (h & (p >> (K - 1)))) & 1 for p in code.abs_polys()
        ))

    def kernel(*refs):
        # e_ref: [S2, nrot*R] pair-major; [wp_ref: [2, CH/32, CH] bf16 when
        # the MXU pack path is on;] sym_ref: [TB, R, B]; m_in/out: [S, B] in
        # position space; dec_ref: [TB, W, B] position-packed.
        if use_pack_mxu:
            e_ref, wp_ref, sym_ref, _m_in, m_scr, dec_ref = refs
        else:
            e_ref, sym_ref, _m_in, m_scr, dec_ref = refs
        # ``m_scr`` is the OUTPUT ref, aliased onto the metrics input
        # (``input_output_aliases`` -- ``_m_in`` is the same buffer and is
        # never read): the kernel updates metrics in place in VMEM across
        # the whole grid -- no scratch buffer, no entry/exit copies, and two
        # of the three S x B metric buffers disappear (admitting larger
        # batches within the same VMEM).
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        dkeys: list[tuple] = []
        for x in range(4):
            if flips[x] not in dkeys:
                dkeys.append(flips[x])

        def make_pens_factory(phase, coefs, base):
            """Per-step penalty evaluator ``pens(i0, n) -> 4 x [n, B]``.

            Everything that does not depend on the chunk -- the combo
            structure, the signed-coefficient matrix, the per-combo scalar
            bases -- is built ONCE per trellis step here (hoisted out of the
            per-chunk bodies, VERDICT r3 #4).

            MXU path (default): pen_f[i, b] = base_f[b] + sum_r s_r E[i, r]
            coef_r[b] with s_r = 1 - 2*f_r is a rank-R contraction, i.e. one
            bf16 matmul ``E [n, R] @ M [R, n_distinct*B]`` with f32
            accumulation.  Exact: E is 0/1 and |coef| <= 255, both bf16-
            representable, and |P| <= R*255 << 2^24.  The kernel is VPU-
            compute-bound (ARCHITECTURE.md roofline), so moving the ~R
            products + 4 signed accumulations per chunk onto the otherwise
            idle MXU is the principal headroom.
            """
            B = base.shape[1]
            if use_mxu:
                cols = []
                sbases = []
                for f in dkeys:
                    cols.append(jnp.concatenate(
                        [-coefs[r] if f[r] else coefs[r] for r in range(R)],
                        axis=0))
                    sv = base
                    for r in range(R):
                        if f[r]:
                            sv = sv + coefs[r]
                    sbases.append(sv)
                M = jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)

                def pens(i0, n):
                    E = e_ref[pl.ds(i0, n),
                              phase * R : (phase + 1) * R].astype(jnp.bfloat16)
                    P = jax.lax.dot_general(
                        E, M, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out = {}
                    for k, f in enumerate(dkeys):
                        out[f] = (P[:, k * B : (k + 1) * B].astype(jnp.int32)
                                  + sbases[k])
                    return [out[flips[x]] for x in range(4)]

                return pens

            def pens(i0, n):
                cols = [e_ref[pl.ds(i0, n), phase * R + r : phase * R + r + 1]
                        for r in range(R)]
                prods = [cols[r] * coefs[r] for r in range(R)]
                distinct = {}
                for f in dkeys:
                    sv = base
                    acc = None
                    for r in range(R):
                        sv = sv + coefs[r] if f[r] else sv
                        signed = -prods[r] if f[r] else prods[r]
                        acc = signed if acc is None else acc + signed
                    distinct[f] = acc + sv
                return [distinct[flips[x]] for x in range(4)]

            return pens

        def acs(mlo, mhi, pens):
            cands = []
            decs = []
            for b in (0, 1):
                c_lo = mlo + pens[0 * 2 + b]
                c_hi = mhi + pens[1 * 2 + b]
                d = c_hi < c_lo  # ties keep the low predecessor
                cands.append(jnp.where(d, c_hi, c_lo))
                decs.append(d.astype(jnp.int32))
            return cands, decs

        def pack(dec, n):
            """[n, B] 0/1 ints -> [n//32, B] packed words (position order).

            MXU path: two banded bf16 matmuls with 16-bit weight halves
            (exact: 0/1 decisions, f32 partial sums < 2^16) replace the
            multiply-by-2^g sublane reduction."""
            B = dec.shape[1]
            if use_pack_mxu:
                d = dec.astype(jnp.bfloat16)
                dims = (((1,), (0,)), ((), ()))
                lo = jax.lax.dot_general(
                    wp_ref[0], d, dims, preferred_element_type=jnp.float32)
                hi = jax.lax.dot_general(
                    wp_ref[1], d, dims, preferred_element_type=jnp.float32)
                return lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)
            return (dec.reshape(n // 32, 32, B) * _pack_weights(B)).sum(axis=1)

        def step(t, phase):
            """One trellis step at static rotation ``phase`` (t traced),
            chunked over the state axis so each inner iteration touches
            O(CH) rows (live-range bound)."""
            j = (K - 2 - phase) % nrot
            sym = sym_ref[t]  # [R, B]
            B = sym.shape[1]
            base = jnp.zeros((1, B), dtype=jnp.int32)
            coefs = []
            for r in range(R):
                base = base + (sym[r : r + 1] - low)
                coefs.append(hl - 2 * sym[r : r + 1])
            pens_fn = make_pens_factory(phase, coefs, base)

            if (1 << (j + 1)) <= CH:
                # Strided chunk: CH positions = CH/2 pairs; the pair bit j
                # interleaves *within* the chunk.
                def chunk(c, _):
                    m_c = m_scr[pl.ds(c * CH, CH)]  # [CH, B]
                    v = m_c.reshape(CH >> (j + 1), 2, 1 << j, B)
                    mlo = v[:, 0].reshape(CH // 2, B)
                    mhi = v[:, 1].reshape(CH // 2, B)
                    pens = pens_fn(c * (CH // 2), CH // 2)
                    cands, decs = acs(mlo, mhi, pens)
                    new = jnp.stack(
                        [x.reshape(CH >> (j + 1), 1 << j, B) for x in cands],
                        axis=1).reshape(CH, B)
                    m_scr[pl.ds(c * CH, CH)] = new
                    if use_word_pack and not use_pack_mxu and (1 << j) >= 32:
                        # Word-aligned phases (2^j >= 32): every packed
                        # 32-run of positions lies wholly inside one b-half,
                        # so pack each half separately and interleave at
                        # WORD granularity -- a 32x smaller shuffle than
                        # restacking CH element rows (A/B lever, VERDICT r4
                        # item 3 "decision-pack reduction").
                        w0 = pack(decs[0], CH // 2)  # [CH/64, B]
                        w1 = pack(decs[1], CH // 2)
                        words = jnp.stack(
                            [x.reshape(CH >> (j + 1), (1 << j) // 32, B)
                             for x in (w0, w1)],
                            axis=1).reshape(CH // 32, B)
                    else:
                        dec = jnp.stack(
                            [x.reshape(CH >> (j + 1), 1 << j, B)
                             for x in decs],
                            axis=1).reshape(CH, B)
                        words = pack(dec, CH)
                    dec_ref[t, pl.ds(c * (CH // 32), CH // 32)] = words
                    return 0

                _loop_chunks(S // CH, chunk)
            else:
                # Half chunk (2**j >= CH): CH consecutive pairs map to two
                # *contiguous* CH-row runs at distance 2**j -- reads and
                # writes are plain slices, no interleave at all.  Indices are
                # built as iv*literal + iv*literal sums (literals multiples of
                # the 8-sublane tile) so Mosaic's divisibility analysis can
                # prove alignment; the shift/AND/OR form of the same address
                # defeats it ("cannot statically prove ... multiple of 8").
                per = (1 << j) // CH  # CH-chunks per low half-run

                def chunk(c, _):
                    c1 = c // per
                    c0 = c - c1 * per
                    i0 = c * CH
                    q0 = c1 * (2 << j) + c0 * CH
                    w0 = c1 * ((2 << j) // 32) + c0 * (CH // 32)
                    mlo = m_scr[pl.ds(q0, CH)]
                    mhi = m_scr[pl.ds(q0 + (1 << j), CH)]
                    pens = pens_fn(i0, CH)
                    cands, decs = acs(mlo, mhi, pens)
                    m_scr[pl.ds(q0, CH)] = cands[0]
                    m_scr[pl.ds(q0 + (1 << j), CH)] = cands[1]
                    dec_ref[t, pl.ds(w0, CH // 32)] = pack(decs[0], CH)
                    dec_ref[t, pl.ds(w0 + ((1 << j) // 32), CH // 32)] = pack(
                        decs[1], CH)
                    return 0

                _loop_chunks(S2 // CH, chunk)

        def group(g, _):
            for u in range(nrot):
                step(g * nrot + u, (p0 + u) % nrot)
            return 0

        @pl.when(i < nb - 1)
        def _():
            jax.lax.fori_loop(0, TB // nrot, group, 0, unroll=False)

        @pl.when(i == nb - 1)
        def _():
            n_full = n_last // nrot
            jax.lax.fori_loop(0, n_full, group, 0, unroll=False)
            for u in range(n_last % nrot):
                step(n_full * nrot + u, (p0 + u) % nrot)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def acs_update_inplace(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics_pos_sb: jnp.ndarray,
    symbols_trb: jnp.ndarray,
    t_real: int,
    t0: int = 0,
    interpret: bool = False,
):
    """Fused in-place ACS over a frame block.

    Args:
      metrics_pos_sb: ``[S, B]`` int32 **in position space** of rotation
        phase ``t0 mod (K-1)`` (state order when ``t0 == 0``; use
        ``rot_perm`` to convert).
      symbols_trb: ``[Tp, R, B]`` int32, ``Tp`` a multiple of
        ``pick_time_block_inplace``.
      t_real: static -- true number of trellis steps in this call.
      t0: static -- trellis steps consumed before this call (for blockwise
        resume; decision positions use the global rotation phase).

    Returns ``(metrics [S, B] in position space of (t0 + t_real) mod (K-1),
    dec_words [Tp, W, B] uint32 packed in position order)``.
    """
    S, B = metrics_pos_sb.shape
    Tp, R, _ = symbols_trb.shape
    W = max(1, S // 32)
    nrot = code.K - 1
    TB = pick_time_block_inplace(code, B)
    if Tp % TB != 0:
        raise ValueError(f"padded T={Tp} not a multiple of time block {TB}")
    t_real = int(t_real)
    if not (0 < t_real <= Tp):
        raise ValueError(f"t_real={t_real} outside (0, {Tp}]")
    nb = -(-t_real // TB)
    n_last = t_real - (nb - 1) * TB
    p0 = int(t0) % nrot

    e_in = jnp.asarray(_phase_tables_np(code))  # [S2, nrot*R] pair-major

    from . import flags as _flags

    CH = _chunk_size(S)
    use_pack_mxu = _flags.inplace_pack_mxu() and S >= 2048
    extra_in = []
    extra_specs = []
    if use_pack_mxu:
        extra_in.append(jnp.asarray(_pack_w_np(CH)).astype(jnp.bfloat16))
        extra_specs.append(pl.BlockSpec((2, CH // 32, CH), lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM))

    kernel = _acs_inplace_kernel(code, numeric, TB, n_last, p0)
    m_out, dec = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((S // 2, nrot * R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
            pl.BlockSpec((TB, R, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, W, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Metrics update IN PLACE: the [S, B] input aliases output 0, so the
        # kernel holds ONE metric buffer instead of in + out + scratch (XLA
        # inserts a defensive copy only when the caller still holds the
        # input alive -- chained/scanned updates are linear and copy-free).
        input_output_aliases={1 + len(extra_in) + 1: 0},
        out_shape=[
            jax.ShapeDtypeStruct((S, B), jnp.int32),
            jax.ShapeDtypeStruct((Tp, W, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(
                int(
                    ((S // 2) * max(nrot * R, 128) * 4  # lane-padded e-table
                     + 2 * TB * R * B * 4
                     + S * B * 4
                     + 2 * TB * W * B * 4) * 1.8
                ),
                kernels.vmem_cap(),
            ),
        ),
        interpret=interpret,
    )(e_in, *extra_in, symbols_trb, metrics_pos_sb)
    return m_out, jax.lax.bitcast_convert_type(dec, jnp.uint32)


def _chainback_inplace_kernel(code: CodeSpec, TB: int, n_last: int,
                              p0: int = 0):
    """``p0``: rotation phase of global step 0 of the walked window --
    nonzero when the window starts mid-stream (StreamingDecoder's
    retained history at ``steps_emitted % (K-1)``)."""
    S = code.num_states
    W = max(1, S // 32)
    K = code.K
    nrot = K - 1

    def kernel(dec_ref, end_ref, bits_ref, state_scr):
        # Identical walk to kernels._chainback_kernel, except the decision
        # word/bit for state ``s`` at global step ``t`` sits at *position*
        # ``rotr(s, (t+1) mod (K-1))`` (the packing order the in-place
        # update kernel produced).
        nb = pl.num_programs(0)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            state_scr[:] = end_ref[:]

        t_base = (nb - 1 - i) * TB
        B = end_ref.shape[1]
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)

        def make_step(steps):
            def step(jj, acc):
                t = steps - 1 - jj
                t_glob = t_base + t
                state = state_scr[:]  # [1, B]
                c = (t_glob + 1 + p0) % nrot  # traced scalar rotation
                pos = (
                    jax.lax.shift_right_logical(state, c)
                    | jax.lax.shift_left(state, nrot - c)
                ) & (S - 1)
                words = dec_ref[t]  # [W, B]
                word = jnp.where(w_iota == (pos >> 5), words, 0).sum(
                    axis=0, keepdims=True)
                k = jax.lax.shift_right_logical(word, pos & 31) & 1
                new_state = jax.lax.shift_right_logical(state, 1) | (
                    k << (K - 2))
                state_scr[:] = new_state
                acc = jnp.where((t & 31) == 31, jnp.zeros_like(acc), acc) | (
                    k << (t & 31))

                @pl.when((t & 31) == 0)
                def _():
                    bits_ref[pl.ds(t_base // 32 + t // 32, 1)] = acc

                return acc

            return step

        acc0 = jnp.zeros((1, B), dtype=jnp.int32)

        @pl.when(i == 0)
        def _():
            jax.lax.fori_loop(0, n_last, make_step(n_last), acc0, unroll=False)

        @pl.when(i > 0)
        def _():
            jax.lax.fori_loop(0, TB, make_step(TB), acc0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def chainback_inplace(
    code: CodeSpec,
    dec_words: jnp.ndarray,
    endstate: jnp.ndarray,
    t_real: int,
    interpret: bool = False,
    t0: int = 0,
):
    """Traceback over position-packed decisions from ``acs_update_inplace``.

    Same contract as ``kernels.chainback_tb``; ``dec_words`` must cover the
    frame from trellis step 0 (the rotation phase is derived from the global
    step index, so blockwise updates concatenate transparently) -- or, for
    a mid-stream window, pass ``t0`` = the absolute trellis step of
    ``dec_words[0]`` (only ``t0 mod (K-1)`` matters)."""
    Tp, W, B = dec_words.shape
    TB = CB_TB
    if Tp % TB != 0:
        raise ValueError(f"padded T={Tp} not a multiple of time block {TB}")
    t_real = int(t_real)
    if not (0 < t_real <= Tp):
        raise ValueError(f"t_real={t_real} outside (0, {Tp}]")
    nb = -(-t_real // TB)
    n_last = t_real - (nb - 1) * TB

    kernel = _chainback_inplace_kernel(code, TB, n_last, int(t0) % (code.K - 1))
    bits = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, W, B), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Tp // 32, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
        out_shape=[jax.ShapeDtypeStruct((Tp // 32, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(
                int((2 * TB * W * B * 4 + (Tp // 32) * B * 4 + 2 * B * 4) * 2.5),
                kernels.vmem_cap(),
            ),
        ),
        interpret=interpret,
    )(
        jax.lax.bitcast_convert_type(dec_words, jnp.int32),
        endstate.astype(jnp.int32),
    )
    return jax.lax.bitcast_convert_type(bits[0], jnp.uint32)
