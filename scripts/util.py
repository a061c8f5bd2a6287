"""Shared helpers for the analysis scripts."""

from __future__ import annotations


def unique(it):
    """Order-preserving unique."""
    seen = set()
    for x in it:
        if x not in seen:
            seen.add(x)
            yield x


_SI = [(1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "k"), (1.0, "")]


def si_scale(value: float) -> tuple[str, float]:
    """(prefix, scale) such that value/scale is in [1, 1000)."""
    v = abs(value)
    for scale, prefix in _SI:
        if v >= scale:
            return prefix, scale
    return "", 1.0
