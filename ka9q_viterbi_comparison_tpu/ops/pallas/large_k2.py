"""Depth-2 fused state-blocked ACS for very large trellises (K=24).

``large_k`` moves the whole metric vector through HBM once per trellis step
plus an XLA column re-interleave -- ~2x the algorithmic minimum.  This kernel
fuses TWO trellis steps per launch: the intermediate metrics never leave the
kernel, so metric traffic (and the XLA re-interleave) halve per step.

Key representation trick: intermediates are kept in RAW BUTTERFLY
COORDINATES.  With state layout ``s = 32c + g`` (sublane g, lane-column c),
the first butterfly's successor ``i = 2*(32c+g) + b1 = 64c + 2g + b1`` is
simply *indexed by* ``(b1, g, c)`` -- no scatter is materialised.  The second
butterfly's predecessor pairing ``(i, i + S/2)`` is elementwise between the
two intermediate groups at identical ``(b1, g, c)`` (adding S/2 only offsets
the column range), and its successor ``f = 2i + b2 = 128c + 4g + 2b1 + b2``
decomposes as

    column(f) = 4c + (g >> 3)          (mod-4 column residue classes)
    row(f)    = 4*(g & 7) + 2*b1 + b2  (a sublane interleave of the four
                                        (b1, b2) candidate arrays)

so the final scatter is four sublane stack/reshapes (supported by Mosaic)
into four mod-4 column-residue outputs, re-interleaved once per TWO steps in
XLA.  Decision words pack in-kernel with weighted sublane reductions:
step-t words at bit ``2*(g&15) + b1``, step-t+1 words at bit ``4q + k``.

Inputs per grid block j (final states ``[j*blk, (j+1)*blk)``): the four
original predecessor column ranges ``P0 + k*S/4`` (k = 0..3), each contiguous.
Each intermediate is consumed by exactly one final block, so there is no
recomputation.

Used for even numbers of trellis steps; an odd tail step runs on the
single-step ``large_k`` kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import CodeSpec, NumericSpec
from . import flags, large_k

__all__ = ["acs_update_large2"]

PACK = 32


def _parity_fold(x):
    for shift in (16, 8, 4, 2, 1):
        x = x ^ (x >> shift)
    return x & 1


def _parity64_np(x):
    for shift in (32, 16, 8, 4, 2, 1):
        x = x ^ (x >> shift)
    return (x & 1).astype(np.int32)


@functools.lru_cache(maxsize=8)
def _par_tables_np(code: CodeSpec):
    """Step-independent branch parities, laid out to match the kernel blocks.

    The branch parity ``parity(pred & (poly_r >> 1))`` depends only on the
    predecessor index -- never on the trellis step or the symbols -- so it
    is a static table, not per-step compute.  Streaming the tables costs
    ~33 MB/pair of extra DMA and reduces each penalty to one broadcast add.
    Measured on v5e (robust chained marginals, ``tools/k24_sweep.py``) the
    table and fold paths time identically at K=24 (2.68 vs 2.68 ms/pair at
    B=4): the two-step kernel is bound by HBM traffic plus per-pair
    overheads, not penalty compute, so this path is kept as the default for
    R <= 2 on net-neutral evidence (``KA9Q_TPU_LK2_TABLES=0`` selects the
    fold path).

    Returns ``(t0, t1)``:
      * ``t0[g, col]`` -- bit r = parity of step-t low-half predecessor
        ``s2 = 32*col + g`` against ``poly_r >> 1`` (cols span ``[0, C/2)``).
      * ``t1[b1][g, c]`` -- same for step-t+1 intermediates
        ``i = 64*c + 2g + b1`` (c spans ``[0, C/4)``).
    """
    S = code.num_states
    C = S // PACK
    g = np.arange(PACK, dtype=np.int64)[:, None]
    t0 = np.zeros((PACK, C // 2), np.int32)
    cols = np.arange(C // 2, dtype=np.int64)[None, :]
    s2 = cols * PACK + g
    c_abs = np.arange(C // 4, dtype=np.int64)[None, :]
    t1 = np.zeros((2, PACK, C // 4), np.int32)
    for r, p in enumerate(code.abs_polys()):
        mask = p >> 1
        t0 |= _parity64_np(s2 & mask) << r
        for b1 in (0, 1):
            i_idx = 64 * c_abs + 2 * g + b1
            t1[b1] |= _parity64_np(i_idx & mask) << r
    return t0, t1


def _pair_kernel(code: CodeSpec, numeric: NumericSpec, Lb4: int, NB: int, mdt,
                 use_tables: bool, residue_in: bool = False,
                 want_g2: bool = False):
    """Lb4: predecessor columns per input block (= blk / (4*32)).

    ``use_tables``: stream the static parity tables (``_par_tables_np``) and
    form each branch penalty as one broadcast add over two pre-multiplied
    ``par_r * coef_r`` products -- the measured-fast path for R<=2.  The
    in-kernel parity-fold path is kept for higher rates (2^R combo tables
    stop paying off).

    ``residue_in``: the four predecessor ranges arrive as 4x4 mod-4
    column-residue pieces (the kernel's own OUTPUT representation) and the
    4-way lane interleave to natural column order happens here in VMEM --
    so the scan carry between pairs is the residue tuple itself and the
    whole-array XLA stack/reshape per pair (an extra HBM read+write of the
    16 MiB-per-frame metric tensor, ~a doubling of the algorithmic
    traffic) disappears."""
    K, R = code.K, code.R
    low = numeric.soft_low
    high = numeric.soft_high
    hl = high + low
    S = code.num_states
    abs_polys = code.abs_polys()
    invs = code.inversions()
    # Trace-time constant bit vectors: k_r for pen_lo at input bit b, and
    # the high-bit flip that turns a lo-predecessor penalty into the hi one.
    bb = [tuple(((b & p & 1) ^ (1 if inv else 0))
                for p, inv in zip(abs_polys, invs)) for b in (0, 1)]
    ch = tuple((p >> (K - 1)) & 1 for p in abs_polys)

    def kernel(*refs):
        # Layout: in0..in3, sym_ref, [t0a, t0b, t1a, t1b,] then outputs
        # in_k: [B, 32, Lb4] original metrics for columns base_k + [0, Lb4);
        # sym_ref: [B, 2*R] (symbols for steps t then t+1, flattened -- a 3-D
        # sym block trips Mosaic's broadcast lowering);
        # t0{a,b}: [32, Lb4] parity combos for grp 0/1 predecessors;
        # t1{a,b}: [32, Lb4] parity combos for b1 = 0/1 intermediates;
        # m*_ref: [B, 32, Lb4] final metrics, column residue * mod 4;
        # w1{e,o}{l,h}_ref: [B, Lb4] step-t words (even/odd col x group lo/hi);
        # w2_*_ref: [B, Lb4] step-t+1 words, column residue * mod 4.
        if residue_in:
            pieces = refs[:16]  # k-major: pieces[4*k + o], o = col mod 4
            sym_ref = refs[16]
            rest = refs[17:]
            B = pieces[0].shape[0]

            def get_in(k):
                ps = [pieces[4 * k + o][:].astype(jnp.int32)
                      for o in range(4)]
                # In-VMEM lane interleave back to natural column order
                # (natural col = 4*c' + o).
                return jnp.stack(ps, axis=-1).reshape(B, PACK, Lb4)
        else:
            in0, in1, in2, in3, sym_ref = refs[:5]
            rest = refs[5:]
            ins = (in0, in1, in2, in3)
            B = in0.shape[0]

            def get_in(k):
                return ins[k][:].astype(jnp.int32)
        if use_tables:
            t0a_ref, t0b_ref, t1a_ref, t1b_ref = rest[:4]
            outs_all = rest[4:]
        else:
            outs_all = rest
        (m0_ref, m1_ref, m2_ref, m3_ref,
         w1el_ref, w1eh_ref, w1ol_ref, w1oh_ref,
         w2_0_ref, w2_1_ref, w2_2_ref, w2_3_ref) = outs_all[:12]
        g2_refs = outs_all[12:] if want_g2 else None
        j = pl.program_id(0)

        g = jax.lax.broadcasted_iota(jnp.int32, (1, PACK, Lb4), 1)
        c_rel = jax.lax.broadcasted_iota(jnp.int32, (1, PACK, Lb4), 2)

        # Per-step symbol affine pieces (compute int32; storage mdt).
        bases = []
        coefs = []
        for step in (0, 1):
            base_s = jnp.zeros((B, 1, 1), dtype=jnp.int32)
            cf = []
            for r in range(R):
                y = sym_ref[:, step * R + r].reshape(B, 1, 1)
                base_s = base_s + (y - low)
                cf.append(hl - 2 * y)
            bases.append(jnp.broadcast_to(base_s, (B, PACK, 1)))
            coefs.append([jnp.broadcast_to(x, (B, PACK, 1)) for x in cf])

        def penalties(step, pred_idx, b):
            """pen_lo, pen_hi [B, PACK, Lb4] for transitions from preds
            ``pred_idx`` (and + S/2) taking input bit b."""
            pen_lo = jnp.broadcast_to(bases[step], (B, PACK, Lb4))
            pen_hi = pen_lo
            for r, (p, inv) in enumerate(zip(code.abs_polys(), code.inversions())):
                c_hi_bit = (p >> (K - 1)) & 1
                base_bits = (b & p & 1) ^ (1 if inv else 0)
                par = _parity_fold(pred_idx & (p >> 1))
                e_lo = par ^ base_bits
                e_hi = par ^ (base_bits ^ c_hi_bit)
                pen_lo = pen_lo + e_lo * coefs[step][r]
                pen_hi = pen_hi + e_hi * coefs[step][r]
            return pen_lo, pen_hi

        def table_pens(step, tbl_ref):
            """Penalty factory over a parity-combo table block.

            pen(k) = base + sum_r (par_r ^ k_r) * c_r
                   = [base + sum_r k_r*c_r]  +  sum_r (1-2k_r) * (par_r*c_r)
            so the [B, PACK, Lb4]-sized work is R products formed once plus
            one signed-combo sum shared across the pens that need it."""
            tbl = tbl_ref[:].reshape(1, PACK, Lb4)
            prods = [((tbl >> r) & 1) * coefs[step][r] for r in range(R)]
            combos = {}

            def pen(kbits):
                if kbits not in combos:
                    vec = None
                    sca = bases[step]
                    for r in range(R):
                        if (kbits >> r) & 1:
                            sca = sca + coefs[step][r]
                            vec = -prods[r] if vec is None else vec - prods[r]
                        else:
                            vec = prods[r] if vec is None else vec + prods[r]
                    combos[kbits] = sca + vec
                return combos[kbits]

            return pen

        def kpack(kvec):
            return sum(k << r for r, k in enumerate(kvec))

        # ---- butterfly 1 (step t): two intermediate groups ----
        # group 0 (intermediates I0): preds P0 (in0) and P0 + S/2 (in2);
        # group 1 (I0 + S/2):        preds P0 + S/4 (in1) and + 3S/4 (in3).
        cands = {}   # (grp, b1) -> [B, PACK, Lb4] (int32 compute)
        d1 = {}
        for grp in (0, 1):
            lo = get_in(grp)
            hi = get_in(grp + 2)
            if use_tables:
                pen0 = table_pens(0, (t0a_ref, t0b_ref)[grp])
            else:
                p_base = (j + grp * NB) * Lb4  # column offset of this range
                pred_idx = (p_base + c_rel) * PACK + g
            for b1 in (0, 1):
                if use_tables:
                    pen_lo = pen0(kpack(bb[b1]))
                    pen_hi = pen0(kpack(tuple(k ^ c for k, c in zip(bb[b1], ch))))
                else:
                    pen_lo, pen_hi = penalties(0, pred_idx, b1)
                c_lo = lo + pen_lo
                c_hi = hi + pen_hi
                d = c_hi < c_lo
                cands[(grp, b1)] = jnp.where(d, c_hi, c_lo)
                d1[(grp, b1)] = d.astype(jnp.int32)

        # step-t decision words: intermediate i = 64c + 2g + b1 lives in word
        # column 2c + (g >= 16), bit 2*(g & 15) + b1.
        q16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)
        for grp, (ev_ref, od_ref) in ((0, (w1el_ref, w1ol_ref)),
                                      (1, (w1eh_ref, w1oh_ref))):
            for ref, sl in ((ev_ref, slice(0, 16)), (od_ref, slice(16, 32))):
                acc = (
                    d1[(grp, 0)][:, sl, :]
                    * jax.lax.shift_left(jnp.ones((1, 16, 1), jnp.int32), 2 * q16)
                    + d1[(grp, 1)][:, sl, :]
                    * jax.lax.shift_left(jnp.ones((1, 16, 1), jnp.int32), 2 * q16 + 1)
                )
                ref[:] = acc.sum(axis=1)

        # ---- butterfly 2 (step t+1) ----
        # Intermediate natural index i = 64*(p_base0 + c_rel)... group 0's
        # intermediate columns start at 2 * P0-column-base; i and i + S/2
        # pair group 0 with group 1 elementwise.
        cand2 = {}
        d2 = {}
        for b1 in (0, 1):
            if use_tables:
                pen1 = table_pens(1, (t1a_ref, t1b_ref)[b1])
            else:
                # Natural intermediate index: i = 64*c_abs + 2g + b1 with
                # c_abs = j*Lb4 + c_rel (original predecessor column).
                i_idx = 64 * (j * Lb4 + c_rel) + 2 * g + b1
            for b2 in (0, 1):
                if use_tables:
                    pen_lo = pen1(kpack(bb[b2]))
                    pen_hi = pen1(kpack(tuple(k ^ c for k, c in zip(bb[b2], ch))))
                else:
                    pen_lo, pen_hi = penalties(1, i_idx, b2)
                c_lo = cands[(0, b1)] + pen_lo
                c_hi = cands[(1, b1)] + pen_hi
                d = c_hi < c_lo
                k = 2 * b1 + b2
                cand2[k] = jnp.where(d, c_hi, c_lo)
                d2[k] = d.astype(jnp.int32)

        # Final scatter: f = 128c + 4g + 2b1 + b2 -> column 4c + (g>>3),
        # row 4*(g&7) + k.  Output o-residue array rows 4q+k come from
        # cand2[k][8o + q].
        outs = (m0_ref, m1_ref, m2_ref, m3_ref)
        wouts = (w2_0_ref, w2_1_ref, w2_2_ref, w2_3_ref)
        q8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        for o in range(4):
            rows = slice(8 * o, 8 * o + 8)
            stacked = jnp.stack(
                [cand2[k][:, rows, :] for k in range(4)], axis=2
            ).reshape(B, PACK, Lb4)
            outs[o][:] = stacked.astype(mdt)
            # Words: bit 4q + k of word col 4c + o.
            acc = None
            accg = None
            for k in range(4):
                wbit = jax.lax.shift_left(jnp.ones((1, 8, 1), jnp.int32),
                                          4 * q8 + k)
                piece = d2[k][:, rows, :] * wbit
                acc = piece if acc is None else acc + piece
                if want_g2:
                    # Radix G_2 plane (ops.radix_planes): the step-t decision
                    # at the step-t+1 survivor's predecessor i = f>>1 with
                    # top bit d2 -- in kernel coordinates that is exactly
                    # d1[(d2, b1)] at the same (g, c): pure elementwise.
                    b1 = k >> 1
                    dlo = d1[(0, b1)][:, rows, :]
                    dhi = d1[(1, b1)][:, rows, :]
                    sel = d2[k][:, rows, :]
                    gbit = dlo + (dhi - dlo) * sel
                    pg = gbit * wbit
                    accg = pg if accg is None else accg + pg
            wouts[o][:] = acc.sum(axis=1)
            if want_g2:
                g2_refs[o][:] = accg.sum(axis=1)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 7))
def acs_update_large2(
    code: CodeSpec,
    numeric: NumericSpec,
    metrics: jnp.ndarray,
    symbols: jnp.ndarray,
    interpret: bool = False,
    metric_dtype: str | None = None,
    want_g2: bool = False,
    time_major: bool = False,
):
    """Two-steps-per-launch ACS; same contract as ``acs_update_large``.

    Returns ``(metrics [B, S] int32, words [B, T, W] uint32, offset [B]
    int32)``; ``offset`` is the block-entry renormalisation shift.  With
    ``want_g2`` the tuple gains a fourth element ``g2 [B, T//2, W]`` uint32
    -- the radix G_2 bit plane per step pair (``ops.radix_planes``), packed
    exactly like the step-t+1 decision words; both steps' decisions are
    already in VMEM in the right coordinates, so it costs one elementwise
    select and W/2 extra words of DMA per pair.

    ``time_major`` returns ``words`` (and ``g2``) in the scan's native
    ``[T, B, W]`` order, skipping the batch-major transpose -- the layout
    the radix plane build consumes (every window slice becomes a cheap
    leading-axis slice; the [B, T, W] transpose of K=24's 348 MiB word
    tensor is pure overhead for that consumer).
    """
    B, S = metrics.shape
    _, T, R = symbols.shape
    metrics, entry_shift = large_k._shift_to_zero(metrics)
    blk = large_k.pick_state_block(code)
    NB = S // blk
    C = S // PACK
    Lb4 = blk // (4 * PACK)
    assert NB * Lb4 * 4 == C

    if metric_dtype is None:
        metric_dtype = numeric.metric_dtype
    if metric_dtype != "auto":
        mdt = jnp.dtype(metric_dtype).type
    else:
        mdt = large_k.metric_dtype_for(code, numeric, T)
    # In-scan renormalisation: when the whole-block worst-case metric
    # overflows int16 (e.g. the ka9q offset-binary alphabet's 510/step
    # branch errors, ref: src/viterbi_configs.h:15-20), subtracting the
    # per-frame minimum every `rn` pairs keeps the spread bounded at
    # ``spread + 2*rn*mbe`` -- decision-invariant (a constant shift changes
    # no compare), path-metric-exact (shifts accumulate into the returned
    # offset), and worth a full metric-tensor read every rn pairs because
    # int16 halves EVERY pair's traffic (measured: ob K=24 matches soft8's
    # rate instead of trailing it ~25 %).  This is the in-scan analogue of
    # the reference's lazy renorm (ref: viterbi224_sse2.cpp:226-250).
    rn = 0
    mbe = numeric.max_branch_error(R)
    spread = numeric.initial_margin + (code.K - 1) * mbe
    if spread + (T + 8) * mbe >= 30000:
        rn_fit = (29000 - spread) // max(1, 2 * mbe)
        if mdt == jnp.int16:
            if rn_fit < 1:
                raise ValueError(
                    f"int16 metrics cannot hold the {numeric.name} spread "
                    f"{spread} even with per-pair renormalisation")
            rn = max(1, int(rn_fit))
        elif metric_dtype == "auto" and rn_fit >= 4:
            mdt = jnp.int16
            rn = int(rn_fit)
    # KA9Q_TPU_LK2_TABLES=0 forces the in-kernel parity-fold path (A/B probe
    # hook, tools/k24_sweep.py); tables are the default for R <= 2.
    use_tables = R <= 2 and flags.lk2_tables()
    # KA9Q_TPU_LK2_RESIDUE=1 carries the metric tensor between pairs in the
    # kernel's own mod-4 column-residue representation, which would remove
    # the whole-array XLA re-interleave per pair (an extra HBM read+write of
    # 16 MiB x B, ~doubling the algorithmic metric traffic).  It is
    # bit-identical in interpret mode (tests/test_large_k.py) but BLOCKED on
    # hardware: Mosaic cannot lower the in-VMEM 4-way lane interleave the
    # kernel prologue needs ("infer-vector-layout: unsupported shape cast",
    # vector<4x32x256x4xi32> -> vector<4x32x1024xi32>).
    #
    # Why the copy is irreducible on this toolchain (VERDICT r2 #3): the
    # pair's column map is the stride permutation col_out = 4*col_in + q
    # (q = g>>3) -- a base-4 digit shift, the trellis analogue of an FFT
    # stage's stride permutation.  For ANY static carry layout L, reading in
    # L and writing in L forces the 4:1 lane merge onto one side of the
    # kernel (tried: natural carry = merge on write via XLA, residue carry =
    # merge on read in VMEM, residue-as-separate-dim [.., 4, Lb4/4] = the
    # same trailing-dims shape cast on either side); a layout INVARIANT
    # under the digit shift does not exist, and the constant-geometry fix
    # (rotating addresses per step, as ops/pallas/inplace.py does in VMEM
    # for K <= 15) would need K-1 = 23 distinct HBM block index maps cycling
    # across scan steps -- inexpressible with a single compiled pallas_call
    # in a scan.  So the options are (a) Mosaic support for in-VMEM 4:1 lane
    # interleaves, or (b) scan-step-dependent BlockSpecs; until one exists,
    # the XLA re-interleave stays and K=24 sits at 12-20 % of HBM roofline
    # (ARCHITECTURE.md).  Default off.
    use_residue = Lb4 % 4 == 0 and flags.lk2_residue()
    if use_residue and rn:
        # The (toolchain-blocked) residue carry keeps the old body; don't
        # compose it with in-scan renorm -- fall back to int32 storage.
        rn, mdt = 0, jnp.int32
    kernel = _pair_kernel(code, numeric, Lb4, NB, mdt, use_tables, use_residue,
                          want_g2)
    m_shape = jax.ShapeDtypeStruct((B, PACK, C // 4), mdt)
    w_shape = jax.ShapeDtypeStruct((B, C // 4), jnp.int32)
    n_wouts = 12 if want_g2 else 8
    in_spec = lambda k: pl.BlockSpec(
        (B, PACK, Lb4), lambda j, k=k: (0, 0, j + k * NB), memory_space=pltpu.VMEM
    )
    out3 = pl.BlockSpec((B, PACK, Lb4), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((B, Lb4), lambda j: (0, j), memory_space=pltpu.VMEM)

    sym_spec = pl.BlockSpec((B, 2 * R), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    if use_residue:
        # 4 predecessor ranges x 4 residue pieces; the residue-o piece of
        # natural columns [(j+k*NB)*Lb4, +Lb4) is the contiguous residue-col
        # block (j+k*NB) of width Lb4/4 (same index map for every o).
        in_spec_res = lambda k: pl.BlockSpec(
            (B, PACK, Lb4 // 4), lambda j, k=k: (0, 0, j + k * NB),
            memory_space=pltpu.VMEM)
        in_specs = [in_spec_res(k) for k in range(4) for _o in range(4)]
        in_specs.append(sym_spec)
    else:
        in_specs = [in_spec(0), in_spec(1), in_spec(2), in_spec(3), sym_spec]
    table_args = ()
    if use_tables:
        t0_np, t1_np = _par_tables_np(code)
        tspec = lambda off: pl.BlockSpec(
            (PACK, Lb4), lambda j, off=off: (0, j + off), memory_space=pltpu.VMEM)
        in_specs += [tspec(0), tspec(NB), tspec(0), tspec(0)]
        t0 = jnp.asarray(t0_np)
        table_args = (t0, t0, jnp.asarray(t1_np[0]), jnp.asarray(t1_np[1]))

    step_call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=[out3] * 4 + [out2] * n_wouts,
        out_shape=[m_shape] * 4 + [w_shape] * n_wouts,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def words_out(w1el, w1eh, w1ol, w1oh, w20, w21, w22, w23, *g2s):
        w1e = jnp.concatenate([w1el, w1eh], axis=-1)  # [B, C/2] word cols 2c
        w1o = jnp.concatenate([w1ol, w1oh], axis=-1)
        w1 = jnp.stack([w1e, w1o], axis=-1).reshape(B, C)
        w2 = jnp.stack([w20, w21, w22, w23], axis=-1).reshape(B, C)
        pair = jnp.stack([w1, w2], axis=0)  # [2, B, C]
        if not g2s:
            return pair, None
        return pair, jnp.stack(list(g2s), axis=-1).reshape(B, C)

    T2 = T // 2
    m3 = metrics.reshape(B, C, PACK).transpose(0, 2, 1).astype(mdt)
    sym_pairs = symbols[:, : 2 * T2].reshape(B, T2, 2 * R).transpose(1, 0, 2)

    if use_residue:
        # Scan carry = the kernel's own residue-split output representation;
        # metrics never round-trip through an XLA re-interleave between
        # pairs (the interleave happens in-kernel, in VMEM).
        def pair_body(m_res, sym_pair):
            args = [m_res[o] for _k in range(4) for o in range(4)]
            m0, m1, m2, m3_, *ws = step_call(*args, sym_pair, *table_args)
            return (m0, m1, m2, m3_), words_out(*ws)

        m_res0 = tuple(m3[:, :, o::4] for o in range(4))
        m_res, (words2, g2w) = jax.lax.scan(pair_body, m_res0, sym_pairs)
        m3 = jnp.stack(m_res, axis=-1).reshape(B, PACK, C)
    else:
        def pair_body(carry, xs):  # metrics: [B, PACK, C] mdt
            m3, off = carry
            i, sym_pair = xs
            m0, m1, m2, m3_, *ws = step_call(
                m3, m3, m3, m3, sym_pair, *table_args
            )
            m_next = jnp.stack([m0, m1, m2, m3_], axis=-1).reshape(B, PACK, C)
            if rn:
                def renorm(m, o):
                    mn = m.min(axis=(1, 2))  # [B], a constant per frame
                    return m - mn[:, None, None], o + mn.astype(jnp.int32)

                m_next, off = jax.lax.cond(
                    (i % rn) == rn - 1, renorm, lambda m, o: (m, o),
                    m_next, off)
            return (m_next, off), words_out(*ws)

        off0 = jnp.zeros((B,), dtype=jnp.int32)
        xs = (jnp.arange(T2, dtype=jnp.int32), sym_pairs)
        (m3, scan_off), (words2, g2w) = jax.lax.scan(
            pair_body, (m3, off0), xs)
        entry_shift = entry_shift + scan_off
    # words2: [T2, 2, B, C] -> [T, B, C] (step order t, t+1 per pair)
    words = words2.reshape(T2 * 2, B, C)

    m_final = m3.astype(jnp.int32).transpose(0, 2, 1).reshape(B, S)
    if time_major:
        all_words = jax.lax.bitcast_convert_type(words, jnp.uint32)
    else:
        all_words = jax.lax.bitcast_convert_type(
            words.transpose(1, 0, 2), jnp.uint32)

    if T % 2:
        # Odd tail: one single-step launch on the last symbol (its own entry
        # shift folds into the returned offset).
        m_final, w_tail, tail_shift = large_k.acs_update_large.__wrapped__(
            code, numeric, m_final, symbols[:, T - 1 :], interpret
        )
        w_tail = w_tail.transpose(1, 0, 2) if time_major else w_tail
        all_words = jnp.concatenate([all_words, w_tail],
                                    axis=0 if time_major else 1)
        entry_shift = entry_shift + tail_shift
    if want_g2:
        g2_words = jax.lax.bitcast_convert_type(
            g2w if time_major else g2w.transpose(1, 0, 2), jnp.uint32)
        return m_final, all_words, g2_words, entry_shift
    return m_final, all_words, entry_shift
