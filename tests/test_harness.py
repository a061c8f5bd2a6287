"""Harness: reference-schema JSON emission and the analysis scripts."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The reference's per-test JSON schema (ref: print_test, src/main.cpp:80-118).
SCHEMA_KEYS = {
    "name", "K", "R", "poly",
    "total_input_bytes", "total_transmit_bits", "total_output_symbols",
    "sampling_time", "minimum_samples", "total_samples",
    "init_ns", "update_ns", "chainback_ns",
    "total_bits", "total_bit_errors", "bit_error_rate",
}


@pytest.fixture(scope="module")
def bench_json(tmp_path_factory):
    from ka9q_viterbi_comparison_tpu.harness.runner import main

    out = tmp_path_factory.mktemp("bench") / "benchmark.json"
    main(["-t", "0.05", "-n", "2", "-o", str(out),
          "--codes", "viterbi27", "--batch", "2", "--frame-bytes", "16"])
    return out


def test_runner_emits_reference_schema(bench_json):
    data = json.loads(bench_json.read_text())
    assert isinstance(data, list) and data
    for t in data:
        assert set(t.keys()) == SCHEMA_KEYS
        assert t["K"] == 7 and t["R"] == 2
        assert t["total_samples"] == len(t["update_ns"]) >= 2
        assert t["total_transmit_bits"] == t["total_input_bytes"] * 8 + 2 * (7 - 1)
        assert t["total_output_symbols"] == t["total_transmit_bits"] * t["R"]
        assert t["bit_error_rate"] == 0.0


def test_sample_counts_respect_minimums(bench_json):
    data = json.loads(bench_json.read_text())
    for t in data:
        assert t["minimum_samples"] == 2
        assert t["total_samples"] >= 2


def test_tabulate_script_runs(bench_json):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tabulate_data.py"),
         str(bench_json)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "## Update symbol rate" in r.stdout
    assert "## Chainback bit rate" in r.stdout


def test_plot_script_runs(bench_json, tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "plot_data.py"),
         str(bench_json), "--out-dir", str(tmp_path), "--chip-name", "test"],
        capture_output=True, text=True, timeout=180,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "plot_symbol_update.png").exists()
    assert (tmp_path / "plot_chainback.png").exists()


def test_runner_rejects_unknown_code(tmp_path):
    from ka9q_viterbi_comparison_tpu.harness.runner import main

    with pytest.raises(SystemExit):
        main(["-o", str(tmp_path / "x.json"), "--codes", "nonesuch"])


def test_marginal_update_timer_runs_on_cpu():
    """time_update_marginal must work (jnp backend) off-TPU."""
    import jax.numpy as jnp

    from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec
    from ka9q_viterbi_comparison_tpu.harness.bench import time_update_marginal
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    code, numeric = VITERBI27, soft8_spec(2)
    data = np.zeros((2, 16), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(2, -1, 2)
    rate = time_update_marginal(code, numeric, syms, backend="jnp",
                                n_chain=2, iters=1)
    assert rate > 0


def test_jnp_family_rotating_route_roundtrip():
    """The jnp family routes mid-size trellises (10 <= K <= 15) through the
    rotating-address formulation (harness/bench.py `use_rot`): the phase
    bench must still decode with zero BER through its position-packed
    chainback chains."""
    import jax.numpy as jnp

    from ka9q_viterbi_comparison_tpu import CodeSpec, soft8_spec
    from ka9q_viterbi_comparison_tpu.harness.bench import run_phase_bench
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    code = CodeSpec("k11r2", K=11, R=2, polys=(0o3345, 0o3613))
    numeric = soft8_spec(code.R)
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=(2, 8), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    r = run_phase_bench(code, numeric, data, syms, name="tpu_jnp",
                        backend="jnp", sampling_time=0.02, minimum_samples=2)
    assert r.total_bit_errors == 0
