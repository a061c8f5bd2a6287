"""Env-knob single source of truth (ops/pallas/flags.py): every default is
pinned, no other module reads KA9Q_TPU_* from the environment, and every
public module survives ``from m import *`` (no ghost __all__ entries)."""

import importlib
import os
import pathlib
import pkgutil
import re

import pytest

import ka9q_viterbi_comparison_tpu as pkg
from ka9q_viterbi_comparison_tpu.ops.pallas import flags

PKG_ROOT = pathlib.Path(pkg.__file__).parent


def test_defaults_pinned(monkeypatch):
    for name in flags.KNOBS:
        monkeypatch.delenv(name, raising=False)
    assert flags.inplace_mode() == "auto"
    assert flags.inplace_unroll() == 1
    assert flags.lk2_tables() is True
    assert flags.lk2_residue() is False


def test_overrides(monkeypatch):
    monkeypatch.setenv("KA9Q_TPU_INPLACE", "0")
    monkeypatch.setenv("KA9Q_TPU_INPLACE_UNROLL", "4")
    monkeypatch.setenv("KA9Q_TPU_LK2_TABLES", "0")
    monkeypatch.setenv("KA9Q_TPU_LK2_RESIDUE", "1")
    assert flags.inplace_mode() == "off"
    assert flags.inplace_unroll() == 4
    assert flags.lk2_tables() is False
    assert flags.lk2_residue() is True
    monkeypatch.setenv("KA9Q_TPU_INPLACE", "1")
    assert flags.inplace_mode() == "force"


def test_no_raw_environ_reads_outside_flags():
    """grep-equivalent: no module but flags.py touches os.environ for a
    KA9Q_TPU_* name (VERDICT r2: a flipped default must not be silent)."""
    pat = re.compile(r"environ[^\n]*KA9Q_TPU_|KA9Q_TPU_[^\n]*environ")
    offenders = []
    for path in PKG_ROOT.rglob("*.py"):
        if path.name == "flags.py":
            continue
        if pat.search(path.read_text()):
            offenders.append(str(path))
    assert not offenders, offenders


def test_knob_table_documented_in_readme():
    readme = (PKG_ROOT.parent / "README.md").read_text()
    for name in flags.KNOBS:
        assert name in readme, f"{name} missing from README knob table"


def _public_modules():
    for mod in pkgutil.walk_packages([str(PKG_ROOT)],
                                     prefix="ka9q_viterbi_comparison_tpu."):
        yield mod.name


@pytest.mark.parametrize("modname", sorted(_public_modules()))
def test_import_star_every_module(modname):
    """``from m import *`` must succeed for every module: __all__ may not
    name things that don't exist (VERDICT r2 weak #3)."""
    mod = importlib.import_module(modname)
    for name in getattr(mod, "__all__", []):
        assert hasattr(mod, name), f"{modname}.__all__ ghost: {name}"
