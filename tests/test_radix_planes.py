"""Bit-plane radix traceback (ops/radix_planes.py): exactness vs the plain
walk, the kernel-emitted G_2 plane, and the dispatch route.

The plane tables are pure function composition over the decision words, so
agreement must hold for ARBITRARY word contents (random words walk arbitrary
survivor paths), any endstate, any anchor, and any T (remainder segments).
Plane arrays are time-major [T, B, W]; the plain walk is batch-major.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu.configs import (
    CodeSpec,
    VITERBI615,
    soft8_spec,
)
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb, radix_planes as rp
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors

K11 = CodeSpec("k11test", K=11, R=2, polys=(0o2672, 0o3545))
K10 = CodeSpec("k10test", K=10, R=2, polys=(0o1234, 0o1571))


def test_plane_plan_covers_and_aligns():
    for max_width in (4, 8):
        for T, anchor in [(87, 0), (87, 23), (64, 0), (45, 8), (96, 14), (30, 23)]:
            segs = rp.plane_plan(T, anchor, max_width)
            covered = [t for t0, w in segs for t in range(t0, t0 + w)]
            assert sorted(covered) == list(range(anchor, T))
            for t0, w in segs:
                assert w in (1, 2, 4, 8) and w <= max_width
                assert (t0 - anchor) % w == 0
            starts = [t0 for t0, _ in segs]
            assert starts == sorted(starts, reverse=True)


def test_plane_plan_bench_frame_is_pure_windows():
    # The reference's K=24 bench frame: 8 bytes -> T = 87, anchor = K-1 =
    # 23: exactly full windows, no remainder segments, at either width.
    assert rp.W_WALK == 4
    assert [w for _, w in rp.plane_plan(87, 23)] == [4] * 16
    assert [w for _, w in rp.plane_plan(87, 23, 8)] == [8] * 8


@pytest.mark.parametrize("code,T,B", [
    (K11, 87, 3),          # remainder at top
    (K11, 64, 2),          # exact multiple of 8
    (VITERBI615, 45, 2),   # K=15, remainder 5
    (K10, 50, 2),          # minimum supported K-1 = 9
])
@pytest.mark.parametrize("endstate", [0, 5])
@pytest.mark.parametrize("max_width", [4, 8])
def test_plane_walk_matches_plain_walk_on_random_words(code, T, B, endstate,
                                                       max_width):
    rng = np.random.default_rng(42)
    W = max(1, code.num_states // 32)
    words = jnp.asarray(rng.integers(0, 2**32, size=(B, T, W), dtype=np.uint32))
    words_tm = words.transpose(1, 0, 2)
    nbits = (T - code.K + 1) // 8 * 8
    ref_bits, _ = cb.chainback_bits(code, words, nbits, endstate)
    for anchor in (0, code.K - 1):
        tabs = rp.build_plane_tables(code, words_tm, anchor, None, max_width)
        assert ("f8" in tabs) == (max_width == 8)
        got_bits, _ = rp.chainback_plane_bits(
            code, words_tm, tabs, nbits, endstate, anchor)
        np.testing.assert_array_equal(np.asarray(ref_bits), np.asarray(got_bits))


def test_plane_anchor_zero_matches_full_walk_state():
    """anchor=0 reproduces the full walk including the start state."""
    code, T, B = K11, 40, 2
    rng = np.random.default_rng(3)
    W = code.num_states // 32
    words = jnp.asarray(rng.integers(0, 2**32, size=(B, T, W), dtype=np.uint32))
    words_tm = words.transpose(1, 0, 2)
    ref_bits, ref_ss = cb.chainback_bits(code, words, 16, 7)
    tabs = rp.build_plane_tables(code, words_tm, 0)
    got_bits, got_ss = rp.chainback_plane_bits(code, words_tm, tabs, 16, 7, 0)
    np.testing.assert_array_equal(np.asarray(ref_bits), np.asarray(got_bits))
    np.testing.assert_array_equal(np.asarray(ref_ss), np.asarray(got_ss))


def test_kernel_g2_matches_jnp_builder():
    """large_k2's want_g2 plane (built elementwise in VMEM from both steps'
    decisions) must equal the v=1 combine over the returned words."""
    code, numeric = K11, soft8_spec(2)
    rng = np.random.default_rng(7)
    B, T = 2, 20
    syms = jnp.asarray(rng.integers(-3, 4, size=(B, T, 2)).astype(np.int32))
    m0 = acs.init_metrics(code, numeric, B)
    m_a, w_a, off_a = large_k2.acs_update_large2(code, numeric, m0, syms, True)
    m_b, w_b, g2, off_b = large_k2.acs_update_large2(
        code, numeric, m0, syms, True, None, True)
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))
    np.testing.assert_array_equal(np.asarray(off_a), np.asarray(off_b))
    tabs = rp.build_plane_tables(code, w_a.transpose(1, 0, 2), 0)
    np.testing.assert_array_equal(
        np.asarray(g2.transpose(1, 0, 2)), np.asarray(tabs["g2"]))


def test_time_major_words_match_batch_major():
    code, numeric = K11, soft8_spec(2)
    rng = np.random.default_rng(9)
    B, T = 2, 21  # odd T exercises the single-step tail in both layouts
    syms = jnp.asarray(rng.integers(-3, 4, size=(B, T, 2)).astype(np.int32))
    m0 = acs.init_metrics(code, numeric, B)
    m_a, w_a, off_a = large_k2.acs_update_large2(code, numeric, m0, syms, True)
    m_b, w_tm, off_b = large_k2.acs_update_large2(
        code, numeric, m0, syms, True, None, False, True)
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    np.testing.assert_array_equal(
        np.asarray(w_a), np.asarray(w_tm.transpose(1, 0, 2)))


def test_plane_roundtrip_decode_dispatch_route():
    """End-to-end as dispatched for K>15: time-major update output ->
    anchored plane tables -> byte-table walk recovers the data exactly."""
    code, numeric = K11, soft8_spec(2)
    rng = np.random.default_rng(11)
    B, nbytes = 2, 8
    data = rng.integers(0, 256, size=(B, nbytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    m0 = acs.init_metrics(code, numeric, B)
    _, w_tm, _ = large_k2.acs_update_large2(
        code, numeric, m0, syms.astype(jnp.int32), True, None, False, True)
    anchor = code.K - 1
    tabs = rp.build_plane_tables(code, w_tm, anchor)
    out = rp.chainback_planes(code, w_tm, tabs, nbytes * 8, 0, anchor)
    assert count_bit_errors(np.asarray(out), data) == 0


@pytest.mark.parametrize("code", [K10, K11], ids=["k10", "k11"])
def test_kernel_emitted_fields_match_jnp_builder(code, rng):
    """The depth-4 kernel's in-kernel field propagation must produce the
    EXACT nibble-packed f4 table the jnp builder derives from decision
    words, and the f4-only walk must decode exactly (the routed K=24
    update path, ops/pallas/large_k4.acs_update_large4_fields)."""
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k4
    from ka9q_viterbi_comparison_tpu.utils.bits import bits_to_bytes

    numeric = soft8_spec(code.R)
    B, nbytes = 2, 6
    data = rng.integers(0, 256, size=(B, nbytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    T = syms.shape[1]
    anchor = code.K - 1
    lead = anchor % 4
    assert (T - anchor) % 4 == 0  # every frame span: T - (K-1) = 8*bytes

    m0 = acs.init_metrics(code, numeric, B)
    m_ref, w_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    tabs_ref = rp.build_plane_tables(
        code, jnp.transpose(w_ref, (1, 0, 2)), anchor)

    m_f, f4, _ = large_k4.acs_update_large4_fields(
        code, numeric, m0, syms, lead, True)
    np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_ref))
    skip = (anchor - lead) // 4
    np.testing.assert_array_equal(
        np.asarray(f4[skip:]), np.asarray(tabs_ref["f4"]))

    bits, _ = rp.chainback_plane_bits(
        code, None, {"f4": f4[skip:]}, nbytes * 8, 0, anchor)
    assert count_bit_errors(np.asarray(bits_to_bytes(bits)), data) == 0


@pytest.mark.parametrize("code", [K10, K11], ids=["k10", "k11"])
def test_kernel_emitted_f8_matches_jnp_builder(code, rng):
    """The paired-quad f8 kernel (second quad seeds its survivor-path
    field propagation with the first quad's f4 table) must produce the
    EXACT byte-packed f8 table the jnp builder derives from decision
    words, and the f8-only walk must decode exactly (the routed K=24
    path at KA9Q_TPU_K24_WALK=8)."""
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k4
    from ka9q_viterbi_comparison_tpu.utils.bits import bits_to_bytes

    numeric = soft8_spec(code.R)
    B, nbytes = 2, 6
    data = rng.integers(0, 256, size=(B, nbytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    T = syms.shape[1]
    a = code.K - 1
    a8 = a - ((a - T % 8) % 8)   # dispatch._anchor8
    lead = a8 % 8

    m0 = acs.init_metrics(code, numeric, B)
    m_ref, w_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    tabs_ref = rp.build_plane_tables(
        code, jnp.transpose(w_ref, (1, 0, 2)), a8, None, 8)

    m_f, f8, _ = large_k4.acs_update_large4_fields8(
        code, numeric, m0, syms, lead, True)
    np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_ref))
    skip = (a8 - lead) // 8
    np.testing.assert_array_equal(
        np.asarray(f8[skip:]), np.asarray(tabs_ref["f8"]))

    bits, _ = rp.chainback_plane_bits(
        code, None, {"f8": f8[skip:]}, nbytes * 8, 0, a8)
    assert count_bit_errors(np.asarray(bits_to_bytes(bits)), data) == 0


def test_plane_tables_reject_small_trellis():
    small = CodeSpec("k9", K=9, R=2, polys=(0x1AF, 0x11D))
    words = jnp.zeros((16, 1, 8), jnp.uint32)
    with pytest.raises(ValueError):
        rp.build_plane_tables(small, words, 0)


def test_dispatch_f8_route_end_to_end():
    """The routed K>15 bench path (dispatch.phase_fns) with the default
    width-8 walk: the update must take the paired field-emitting kernels
    (dict with an f8 table, no decision words), and the chainback's
    independently derived anchor must reproduce the data exactly --
    pinning the two anchor derivations against each other on CPU."""
    from ka9q_viterbi_comparison_tpu.ops.pallas import dispatch

    code = CodeSpec("k17test", K=17, R=2, polys=(0o345567, 0o251331))
    numeric = soft8_spec(2)
    B, nbytes = 2, 4
    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, size=(B, nbytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)

    fns = dispatch.phase_fns(code, numeric, nbytes * 8, B)
    init_fn, update_fn, chainback_fn, prepare_fn = fns[:4]
    m, w, _ = update_fn(init_fn(B), prepare_fn(syms))
    assert isinstance(w, dict) and "f8" in w and "f4" not in w
    out = np.asarray(chainback_fn(w))
    assert count_bit_errors(out, data) == 0
