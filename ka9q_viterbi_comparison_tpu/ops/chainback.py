"""Chainback (traceback) of the survivor path.

Reference hot loop #2 is a strictly serial per-bit state walk with scalar
decision-bit lookups (ref: ka9q_libfec_port/viterbi27_sse2.cpp:78-105).  The
serial dependency along time is fundamental to traceback, so the TPU-native
answer is to make every *other* axis wide: the walk runs as a reverse
``lax.scan`` whose per-step work is a handful of vector ops across B frames on
the VPU lanes -- the batch replaces the reference's (absent) parallelism for
this phase entirely.

Per step (all ``[B]``-vectorised):

    word  = decision_words[t][state >> 5]        (select / small gather)
    k     = (word >> (state & 31)) & 1
    state = (state >> 1) | (k << (K-2))          (ref: viterbi27_sse2.cpp:101-102,
                                                  viterbi615_sse2.cpp:86-88)

``k`` at step t IS decoded bit t (it is the bit that fell out of the encoder
register), so the reverse-scan's stacked outputs are the decoded bit stream in
natural order; bytes are packed MSB-first like the reference's chainback
byte-accumulation trick produces (viterbi27_sse2.cpp:97-103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import CodeSpec
from ..utils.bits import bits_to_bytes

__all__ = ["chainback_bits", "chainback"]


def _select_word(words: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pick ``words[b, idx[b]]`` from ``[B, W]`` uint32.

    For the small trellises (W <= 8) a where-chain keeps everything in vector
    registers; larger trellises use a gather.
    """
    W = words.shape[-1]
    if W == 1:
        return words[..., 0]
    if W <= 8:
        out = words[..., 0]
        for w in range(1, W):
            out = jnp.where(idx == w, words[..., w], out)
        return out
    return jnp.take_along_axis(words, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]


@functools.partial(jax.jit, static_argnums=(0, 2, 4))
def chainback_bits(
    code: CodeSpec,
    decision_words: jnp.ndarray,
    num_data_bits: int,
    endstate: jnp.ndarray | int = 0,
    rotated: bool = False,
):
    """Trace back through ``decision_words [B, T, W]`` (uint32) from
    ``endstate`` at the final step, returning decoded data bits ``[B,
    num_data_bits]`` uint8.

    The decision at transition ``t`` selects the top bit of the *predecessor*
    state, which is data bit ``b_{t-K+1}`` -- so the first K-1 walk outputs
    (bits of the initial state) are dropped.  This is the same K-1 offset the
    reference handles with its ``d += tail`` "look past tail" skip
    (viterbi27_sse2.cpp:97).

    ``rotated``: the words are position-packed by ``acs_update_rotating`` --
    the decision for state ``s`` at step ``t`` sits at bit position
    ``rotr(s, (t+1) mod (K-1))`` (two shifts + or + mask on the walk state
    per step; the walk itself is unchanged).

    Also returns the start state reached ``[B]`` int32 (state at t=0; 0 for a
    frame decoded from reset).
    """
    B, T, W = decision_words.shape
    K = code.K
    nrot = K - 1
    mask = jnp.int32(code.num_states - 1)
    end = jnp.broadcast_to(jnp.asarray(endstate, dtype=jnp.int32) & mask, (B,))

    def bit_pos(state, t):
        """Packed bit position of state ``state``'s decision at step ``t``."""
        if not rotated:
            return state
        rho = (t + 1) % nrot
        return ((state >> rho) | (state << (nrot - rho))) & mask

    if W * 4 > 64 * 1024 and B <= 64:
        # Huge trellises (K=24): a batched gather over the [B, W] slice makes
        # XLA stream the whole 1 MiB x B row per step; per-frame scalar
        # ``dynamic_slice`` fetches only the touched 4-byte word instead
        # (measured 1.9x: 0.64 vs 0.34 Mbit/s).  The remaining cost is the
        # platform's dependent-fetch latency, ~1.2 us per 4-byte fetch,
        # serialized by XLA's sequential schedule -- the only parallel-fetch
        # primitive (a Pallas async copy from HBM) does not compile on this
        # toolchain (tools/k24_cb_probe2.py), so ~(T x B x 1.2 us) is the
        # documented floor for this phase.  Still ~100x faster than the K=24
        # symbol update, so it never gates end-to-end decode (ref analogue:
        # one random load per step, viterbi224_sse2.cpp:93-105).
        def body_ds(state, t):
            pos = bit_pos(state, t)
            ks = []
            for b in range(B):
                idx = (pos[b] >> 5).astype(jnp.int32)
                word = jax.lax.dynamic_slice(
                    decision_words, (b, t, idx), (1, 1, 1))[0, 0, 0]
                ks.append(
                    (word >> (pos[b] & 31).astype(jnp.uint32)).astype(jnp.int32) & 1
                )
            k = jnp.stack(ks)
            return (state >> 1) | (k << (K - 2)), k.astype(jnp.uint8)

        start_state, ks = jax.lax.scan(
            body_ds, end, jnp.arange(T, dtype=jnp.int32), reverse=True
        )
    else:
        def body(state, xs):
            t, words_t = xs
            pos = bit_pos(state, t)
            idx = pos >> 5
            word = _select_word(words_t, idx)
            k = (word >> (pos & 31).astype(jnp.uint32)).astype(jnp.int32) & 1
            new_state = (state >> 1) | (k << (K - 2))
            return new_state, k.astype(jnp.uint8)

        start_state, ks = jax.lax.scan(
            body, end,
            (jnp.arange(T, dtype=jnp.int32), decision_words.transpose(1, 0, 2)),
            reverse=True,
        )

    bits = ks.transpose(1, 0)[:, code.K - 1 : code.K - 1 + num_data_bits]
    return bits, start_state


@functools.partial(jax.jit, static_argnums=(0, 2, 4))
def chainback(
    code: CodeSpec,
    decision_words: jnp.ndarray,
    num_data_bits: int,
    endstate: jnp.ndarray | int = 0,
    rotated: bool = False,
) -> jnp.ndarray:
    """Decode to bytes ``[B, num_data_bits // 8]`` uint8 (MSB-first)."""
    if num_data_bits % 8 != 0:
        raise ValueError("num_data_bits must be a multiple of 8")
    bits, _ = chainback_bits(code, decision_words, num_data_bits, endstate, rotated)
    return bits_to_bytes(bits)
