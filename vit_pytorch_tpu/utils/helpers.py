"""Small shared helpers (reference vit.py:10-11 and friends)."""

from __future__ import annotations

from typing import Sequence


def exists(v):
    return v is not None


def default(v, d):
    return v if exists(v) else d


def pair(t):
    """reference vit.py:10-11"""
    return t if isinstance(t, (tuple, list)) else (t, t)


def triple(t):
    return t if isinstance(t, (tuple, list)) else (t, t, t)


def cast_tuple(t, length: int = 1):
    return tuple(t) if isinstance(t, (tuple, list)) else ((t,) * length)


def divisible_by(numer: int, denom: int) -> bool:
    return (numer % denom) == 0
