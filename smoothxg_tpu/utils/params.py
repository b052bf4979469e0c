"""Parameter parsing helpers.

handy_parameter mirrors the reference's magnitude-suffix parsing
(reference: src/utils.cpp:56-76): "5k" -> 5000, "1M" -> 1e6, "2G" -> 2e9.
"""
from __future__ import annotations


def handy_parameter(value: str | int | float, default: float = 0) -> float:
    if isinstance(value, (int, float)):
        return float(value)
    s = value.strip()
    if not s:
        return float(default)
    mult = 1.0
    if s[-1] in "kK":
        mult, s = 1e3, s[:-1]
    elif s[-1] in "mM":
        mult, s = 1e6, s[:-1]
    elif s[-1] in "gG":
        mult, s = 1e9, s[:-1]
    try:
        return float(s) * mult
    except ValueError:
        return float(default)


def split_csv(s: str, sep: str = ",") -> list[str]:
    return [x for x in s.split(sep)] if s else []
