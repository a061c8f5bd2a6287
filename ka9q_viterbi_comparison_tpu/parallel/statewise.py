"""State-sharded trellis decoding for very large constraint lengths (K=24).

The reference's K=24 "ICE" decoder burns 16 MiB of path metrics and 1 MiB of
decisions per transmitted bit on one core (ref: viterbi224_sse2.cpp:14-20,
:61); its only parallelism is the SSE lane sweep.  On TPU the 2^23-state
metric vector is the thing to shard: the ``state`` mesh axis splits new
states into contiguous blocks per device, and each trellis step performs the
butterfly's cross-shard exchange explicitly.

Exchange pattern per step (n devices, S states): device d owns new states
``[d*S/n, (d+1)*S/n)``, i.e. predecessor pairs ``s2 in [d*S/(2n),
(d+1)*S/(2n))`` -- which live in the LOW half of old-state device ``d // 2``
and the HIGH half of old-state device ``d // 2 + n/2``.  Equivalently every
device splits its old shard in half and sends the halves to devices ``2q``
and ``2q + 1`` (mod the high-half offset) -- two ``ppermute``s of half-shards
per step over ICI.  This is the distributed form of the in-register butterfly
the reference does with unpacklo/unpackhi (ref: viterbi27_sse2.cpp:157-166).

Branch penalties are computed on the fly from polynomial parity over a
``broadcasted_iota`` of the local state block (the K=24 expected-bit table
would be 64 MiB materialised, ref SURVEY §2.1), using the identity

    parity(((s2 << 1) | b | h << (K-1)) & p)
      = parity(s2 & (p >> 1)) ^ (b & p) ^ (h & (p >> (K-1)))

so only ``parity(s2 & (p >> 1))`` varies across the block.

Chainback with sharded decisions: every device walks the survivor serially;
at each step the single decision bit is recovered with a ``psum`` of the
owner's one-hot-selected bit.  Fine for the short ICE frames (8 data bytes,
ref: src/main.cpp:414).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..configs import CodeSpec, NumericSpec
from ..utils.bits import bits_to_bytes

__all__ = ["state_sharded_decode", "state_sharded_decode_bits"]

# ---------------------------------------------------------------------------
# Shared state-sharded building blocks (used here and by parallel.state_time's
# composed state x time mesh).  All run INSIDE a shard_map over `state_axis`.
# ---------------------------------------------------------------------------


def butterfly_perms(n_dev: int):
    """``ppermute`` plans for the butterfly halves.  Receiver d needs, as
    half-shard chunks of the OLD metric vector:

    * ``old_lo``: global old states ``[d*chunk, (d+1)*chunk)`` -> source
      device ``d // 2``, half ``d % 2`` of its shard;
    * ``old_hi``: global old states ``[S/2 + d*chunk, S/2 + (d+1)*chunk)``
      -> source device ``(n + d) // 2``, half ``(n + d) % 2``
      (``S/2 = n*chunk``, and a shard holds 2 chunks).

    One ppermute per (target-chunk, source-half) pair; devices missing from a
    permutation receive zeros, so the two halves sum cleanly."""

    def _half_perm(src, half_sel, which):
        return [(src(t), t) for t in range(n_dev) if half_sel(t) == which]

    perm_lo = [
        _half_perm(lambda t: t // 2, lambda t: t % 2, w) for w in (0, 1)
    ]
    perm_hi = [
        _half_perm(lambda t: (n_dev + t) // 2, lambda t: (n_dev + t) % 2, w)
        for w in (0, 1)
    ]
    return perm_lo, perm_hi


def _exchange(m_local, chunk, state_axis, perm_lo, perm_hi):
    """Old metrics ``[B, n_local]`` -> ``(old_lo, old_hi)`` each ``[B, chunk]``
    for the local s2 range (two half-shard ppermutes per half over ICI)."""
    halves = (m_local[:, :chunk], m_local[:, chunk:])
    lo = jax.lax.ppermute(halves[0], state_axis, perm_lo[0]) + \
         jax.lax.ppermute(halves[1], state_axis, perm_lo[1])
    hi = jax.lax.ppermute(halves[0], state_axis, perm_hi[0]) + \
         jax.lax.ppermute(halves[1], state_axis, perm_hi[1])
    return lo, hi


def _sharded_acs_scan(code, numeric, m_local0, sym, state_axis, n_dev,
                      s2_block, record: bool):
    """State-sharded ACS over ``sym [B, Tloc, R]`` (replicated) from local
    metrics ``m_local0 [B, n_local]``.  Returns ``(m_final, dec_local)``
    where ``dec_local`` is ``[Tloc, B, n_local]`` bool if ``record`` else
    ``None``."""
    S = code.num_states
    chunk = S // (2 * n_dev)
    B, _, _ = sym.shape
    n_local = S // n_dev
    perm_lo, perm_hi = butterfly_perms(n_dev)

    def body(m_local, sym_t):
        old_lo, old_hi = _exchange(m_local, chunk, state_axis, perm_lo, perm_hi)
        pens = _local_penalties(code, numeric, sym_t, s2_block)
        cands = []
        decs = []
        for b in (0, 1):
            c_lo = old_lo + pens[(0, b)]
            c_hi = old_hi + pens[(1, b)]
            dsel = c_hi < c_lo
            cands.append(jnp.where(dsel, c_hi, c_lo))
            decs.append(dsel)
        new = jnp.stack(cands, axis=-1).reshape(B, n_local)
        dec = jnp.stack(decs, axis=-1).reshape(B, n_local)
        return new, (dec if record else None)

    return jax.lax.scan(body, m_local0, sym.transpose(1, 0, 2))


def _sharded_traceback(code, dec_local, end, base, state_axis):
    """Serial traceback over state-sharded decisions ``[Tloc, B, n_local]``;
    the bit at each step is recovered with a ``psum`` of the owning device's
    one-hot-selected decision (O(Tloc) collectives -- see the scaling note in
    :func:`state_sharded_decode_bits`).  Returns bits ``[B, Tloc]`` uint8."""
    K = code.K
    n_local = dec_local.shape[-1]
    local_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1) + base

    def tb_body(state, dec_t):
        owner_sel = (local_iota == state[:, None]).astype(jnp.int32)
        k = jax.lax.psum((owner_sel * dec_t.astype(jnp.int32)).sum(axis=1),
                         state_axis)
        new_state = (state >> 1) | (k << (K - 2))
        return new_state, k.astype(jnp.uint8)

    _, ks = jax.lax.scan(tb_body, end, dec_local, reverse=True)
    return ks.transpose(1, 0)


def _parity_of(x: jnp.ndarray) -> jnp.ndarray:
    """Bitwise parity of int32 values (vectorised XOR fold)."""
    for shift in (16, 8, 4, 2, 1):
        x = x ^ (x >> shift)
    return x & 1


def _local_penalties(code: CodeSpec, numeric: NumericSpec, sym_t: jnp.ndarray,
                     s2_block: jnp.ndarray):
    """Branch penalties for the local predecessor block.

    sym_t: ``[B, R]`` int32; s2_block: ``[chunk]`` int32 global s2 indices.
    Returns ``pen[(h, b)]`` of shape ``[B, chunk]``.
    """
    K = code.K
    low = numeric.soft_low
    high = numeric.soft_high
    B = sym_t.shape[0]
    pens = {}
    for h in (0, 1):
        for b in (0, 1):
            acc = jnp.zeros((B, s2_block.shape[0]), dtype=jnp.int32)
            for r, (p, inv) in enumerate(zip(code.abs_polys(), code.inversions())):
                e = (
                    _parity_of(s2_block & (p >> 1))
                    ^ (b & p & 1)
                    ^ (h & (p >> (K - 1)) & 1)
                    ^ (1 if inv else 0)
                )[None, :]
                y = sym_t[:, r][:, None]
                acc = acc + jnp.where(e == 1, high - y, y - low)
            pens[(h, b)] = acc
    return pens


def state_sharded_decode_bits(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    mesh: Mesh,
    state_axis: str = "state",
) -> jnp.ndarray:
    """Decode ``[B, T, R]`` frames with the trellis state axis sharded over
    ``mesh[state_axis]``.  Returns trellis bits ``[B, T]`` uint8.

    Requires ``num_states % (2 * n_dev) == 0`` (any even device count for
    K >= 3 works).

    Scaling note: the traceback below issues one ``psum`` per trellis step
    (serial data dependency -- the owner of the survivor state changes every
    step), so it is O(T) collectives.  That is the right trade for the config
    this sharding exists for (K=24 ICE: 8-byte frames, T < 100,
    ref: src/main.cpp:414, and an update phase ~100x more expensive); for
    long streams, decode time-blocks with ``parallel.timeblock`` and keep the
    state axis for the update only.
    """
    n_dev = mesh.shape[state_axis]
    S = code.num_states
    if S % (2 * n_dev) != 0 or n_dev % 2 != 0 and n_dev != 1:
        raise ValueError(f"device count {n_dev} incompatible with S={S}")
    B, T, R = symbols.shape
    chunk = S // (2 * n_dev)  # half-shard: the unit the butterfly exchanges
    K = code.K

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), ),
        out_specs=P(),
    )
    def run(sym):  # replicated symbols [B, T, R]
        d = jax.lax.axis_index(state_axis)
        n_local = S // n_dev
        base = d * n_local
        # Local NEW-state block is [base, base + n_local); its predecessor
        # s2 range is [base//2, base//2 + chunk).
        s2_block = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0] + (base // 2)

        m_local0 = jnp.full((B, n_local), numeric.initial_margin, dtype=jnp.int32)
        on_dev0 = (d == 0).astype(jnp.int32)
        m_local0 = m_local0.at[:, 0].add(-numeric.initial_margin * on_dev0)

        m_final, dec_local = _sharded_acs_scan(
            code, numeric, m_local0, sym, state_axis, n_dev, s2_block, True)
        # dec_local: [T, B, n_local] bool, sharded by state.

        # Serial traceback, bit recovered by the owning device each step.
        # NOTE scaling limit: this is O(T) psum collectives (one per trellis
        # step) plus an O(n_local) ownership mask per step -- fine for the
        # short ICE frames this sharding exists for (T = 87 at 8 data
        # bytes), but a long K=24 stream should decode on a composed
        # state x time mesh instead (parallel/state_time.py), which keeps
        # every traceback inside one time block.
        end = jnp.zeros((B,), dtype=jnp.int32)  # tail-terminated
        return _sharded_traceback(code, dec_local, end, base, state_axis)

    return run(symbols)


def state_sharded_decode(
    code: CodeSpec,
    numeric: NumericSpec,
    symbols: jnp.ndarray,
    num_data_bits: int,
    mesh: Mesh,
    state_axis: str = "state",
) -> jnp.ndarray:
    bits = state_sharded_decode_bits(code, numeric, symbols, mesh, state_axis)
    return bits_to_bytes(bits[:, code.K - 1 : code.K - 1 + num_data_bits])
