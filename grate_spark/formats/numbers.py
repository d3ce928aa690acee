"""Continued-fraction approximation for Excel fraction formats.

Implements the Kennedy decimal-to-fraction algorithm with digit budgets,
matching the reference (``commonxl/numbers.go``) including its rounding
and bail-out behaviors, so ``# ?/?`` style formats render identically.
"""

from __future__ import annotations

import math


def _go_round(x: float) -> float:
    # Go math.Round: half away from zero
    if x >= 0:
        return math.floor(x + 0.5)
    return math.ceil(x - 0.5)


def decimal_to_fraction(val: float, nn: int, nd: int) -> tuple[int, int]:
    """Fraction approximation, <=nn digits numerator / <=nd denominator
    (commonxl/numbers.go:26-74)."""
    sign = 1
    z = val
    if val < 0:
        sign = -1
        z = -val
    if nn == 0:
        nn = 2
    if nd == 0:
        nd = 2
    maxn = math.pow(10.0, nn)
    maxd = math.pow(10.0, nd)

    frac_part = math.modf(val)[0]
    if frac_part == 0.0:
        return int(z) * sign, 1
    if frac_part < 1e-9:
        return sign, int(1e9)
    if frac_part > 1e9:
        return int(1e9) * sign, 1

    diff = 1.0
    denom = 1.0
    numer = 0.0
    last_denom = 0.0
    last_numer = 0.0
    while diff > 1e-10 and z != math.floor(z):
        z = 1 / (z - math.floor(z))
        tmp = denom
        denom = denom * math.floor(z) + last_denom
        last_denom = tmp
        last_numer = numer
        numer = _go_round(val * denom)
        if numer >= maxn or denom >= maxd:
            return sign * int(last_numer), int(last_denom)
        diff = abs(val - numer / denom)
    return sign * int(numer), int(denom)


def decimal_to_whole_fraction(val: float, nn: int, nd: int
                              ) -> tuple[int, int, int]:
    """(whole, numerator, denominator) split (commonxl/numbers.go:10-21)."""
    part, whole_f = math.modf(val)
    if part == 0.0:
        return int(whole_f), 0, 1
    if part < 0.0:
        part = -part
    whole = int(whole_f)
    num, den = decimal_to_fraction(part, nn, nd)
    return whole, num, den
