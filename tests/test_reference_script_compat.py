"""Byte-compatibility of our benchmark JSON with the reference's OWN
analysis scripts: the upstream tabulator must parse and tabulate our output
unmodified (SURVEY §5: "keep this schema verbatim so the reference's scripts
work on the new framework's output")."""

import os
import subprocess
import sys

import pytest

REF_SCRIPTS = "/root/reference/scripts"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SCRIPTS), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def bench_json(tmp_path_factory):
    from ka9q_viterbi_comparison_tpu.harness.runner import main

    out = tmp_path_factory.mktemp("bench") / "benchmark.json"
    main(["-t", "0.05", "-n", "2", "-o", str(out),
          "--codes", "viterbi27", "--batch", "2", "--frame-bytes", "16"])
    return out


def test_reference_tabulator_accepts_our_json(bench_json):
    r = subprocess.run(
        [sys.executable, os.path.join(REF_SCRIPTS, "tabulate_data.py"),
         str(bench_json)],
        capture_output=True, text=True, timeout=120, cwd=REF_SCRIPTS,
    )
    assert r.returncode == 0, r.stderr
    assert "## Update symbol rate" in r.stdout
    assert "## Chainback bit rate" in r.stdout
    # Our decoder family names appear as columns in the reference's table.
    assert "tpu_jnp" in r.stdout
