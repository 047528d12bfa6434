"""Rounding that matches DuckDB's ROUND (half away from zero).

Python's ``round`` and numpy/pyarrow defaults are banker's rounding
(half to even); DuckDB rounds half away from zero.  Exact binary
midpoints (e.g. 137/32 = 4.28125) hit this systematically, so every
value that feeds the driver's value-hash comparison goes through these
helpers instead.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.compute as pc


def round_half_away(x: float, dp: int) -> float:
    """DELIBERATELY the naive double scale-round-unscale: DuckDB's
    round(DOUBLE, k) performs exactly this float64 arithmetic, so
    parity requires replicating it bit for bit — including the cases
    where the double product re-rounds across a .5 boundary (e.g. the
    double below 0.81875 still rounds to 0.8188 on BOTH sides because
    x*1e4 lands exactly on 8187.5).  A "more accurate" long-double
    product was tried and DISAGREES with DuckDB on those rows.
    Gotcha when testing this: embed no float literals in DuckDB SQL —
    DuckDB parses literals through DECIMAL, which silently loses
    precision for significands above 2^53; bind the parameter
    instead."""
    m = 10 ** dp
    return math.copysign(math.floor(abs(x) * m + 0.5), x) / m


def np_round_half_away(arr: np.ndarray, dp: int) -> np.ndarray:
    m = 10.0 ** dp
    return np.copysign(np.floor(np.abs(arr) * m + 0.5), arr) / m


def pc_round(col, dp: int):
    """pyarrow round with DuckDB-compatible midpoint behavior."""
    return pc.round(col, ndigits=dp, round_mode="half_towards_infinity")
