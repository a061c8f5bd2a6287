#!/usr/bin/env python
"""Ad-hoc CPU (interpret-mode) correctness check for ops.pallas.inplace."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI27, VITERBI29, VITERBI615, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.pallas import inplace
from ka9q_viterbi_comparison_tpu.ops.pallas.dispatch import unpack_bit_words
from ka9q_viterbi_comparison_tpu.utils.bits import bits_to_bytes

rng = np.random.default_rng(7)


def check(code, n_bytes, B=2, blocks=None):
    numeric = soft8_spec(code.R)
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    symbols = np.asarray(encode_frames(code, numeric, jnp.asarray(data)))
    T = n_bytes * 8 + code.K - 1
    symbols = symbols.reshape(B, T, code.R).astype(np.int32)

    # Reference jnp path.
    m_ref, words_ref, _ = acs.acs_update(
        code, numeric, acs.init_metrics(code, numeric, B), jnp.asarray(symbols), True)
    bytes_ref = cb.chainback(code, words_ref, n_bytes * 8)

    # In-place kernel, optionally split into blocks with t0 threading.
    m = acs.init_metrics(code, numeric, B).T  # [S, B], state order == phase 0
    splits = blocks or [T]
    assert sum(splits) == T
    t0 = 0
    dec_all = []
    for n in splits:
        Tp = inplace.pad_time_inplace(code, n, B)
        sym = np.zeros((Tp, code.R, B), np.int32)
        sym[:n] = symbols[:, t0 : t0 + n].transpose(1, 2, 0)
        if t0:
            # metrics held in state order between blocks: rotate in.
            m = m[inplace.rot_perm(code, t0)]
        m, dec = inplace.acs_update_inplace(
            code, numeric, m, jnp.asarray(sym), n, t0, True)
        m = m[inplace.rot_perm(code, t0 + n, inverse=True)]  # back to state order
        dec_all.append(np.asarray(dec[:n]))
        t0 += n
    np.testing.assert_array_equal(np.asarray(m.T), np.asarray(m_ref),
                                  err_msg=f"metrics K={code.K}")

    dec = np.concatenate(dec_all, axis=0)  # [T, W, B]
    Tp_cb = -(-T // inplace.CB_TB) * inplace.CB_TB
    dec_p = np.zeros((Tp_cb,) + dec.shape[1:], dec.dtype)
    dec_p[:T] = dec
    end = jnp.zeros((1, B), jnp.int32)
    bits_words = inplace.chainback_inplace(code, jnp.asarray(dec_p), end, T, True)
    bits = unpack_bit_words(bits_words, T)[:B]
    out = bits_to_bytes(bits[:, code.K - 1 : code.K - 1 + n_bytes * 8])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bytes_ref),
                                  err_msg=f"chainback K={code.K}")
    np.testing.assert_array_equal(np.asarray(out), data,
                                  err_msg=f"roundtrip K={code.K}")
    print(f"K={code.K} R={code.R} n={n_bytes} blocks={splits}: OK", flush=True)


if __name__ == "__main__":
    check(VITERBI27, 8)
    check(VITERBI27, 8, blocks=[13, 25, 32])  # odd split points
    check(VITERBI29, 6)
    check(VITERBI29, 6, blocks=[7, 49])
    check(VITERBI615, 4)
    check(VITERBI615, 4, blocks=[11, 35])
    print("ALL OK")
