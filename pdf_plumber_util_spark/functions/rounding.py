"""Banker's (half-to-even) rounding as pure Column expressions.

The reference quantizes everything with Python ``round()`` — round-half-to-
EVEN — at `src/pdf_plumb/utils/helpers.py:8-13` (``round_to_nearest``),
`core/extractor.py:395` (``round(size*2)/2``), `plumb_layout.py:43-47,144-148`
(quarter rounding) and `core/extractor.py:679` (space-count rounding).
Spark's builtin ``round()`` is half-AWAY-from-zero, so using it would break
the byte-identity invariant on exact .5 boundaries (e.g. 12.25 at step 0.5:
Python -> 12.0, Spark round -> 12.5).

We replicate half-to-even JVM-side (stays inside whole-stage codegen — no
UDF in the hot path): for q = v/step,

    r = q - floor(q)
    rounded_q = floor(q) + 1            if r > 0.5
              = floor(q)                if r < 0.5
              = floor(q) + (floor(q) % 2 != 0)   if r == 0.5  (tie -> even)

Both Python and Spark evaluate v/step in IEEE-754 double, so the tie cases
coincide exactly: ``r == 0.5`` happens iff the double quotient is exactly
representable as x.5, which is precisely when CPython's round() applies the
tie rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def py_round(col: Column) -> Column:
    """Python-semantics round(col) -> nearest integer, half to even.

    Returns a DoubleType column holding an integral value (keeps double to
    avoid overflow surprises; cast at call sites that need ints).
    """
    f = F.floor(col).cast("double")
    r = col - f
    is_f_even = (f % 2 == 0)
    return (
        F.when(r > 0.5, f + 1)
        .when(r < 0.5, f)
        .otherwise(F.when(is_f_even, f).otherwise(f + 1))
    )


def round_to_nearest(col: Column, step: float) -> Column:
    """round(v/step)*step with Python half-to-even (helpers.py:8-13)."""
    return py_round(col / F.lit(float(step))) * F.lit(float(step))


def round_half(col: Column) -> Column:
    """round(x*2)/2 — font-size quantization (extractor.py:395)."""
    return py_round(col * 2) / 2


def round_quarter(col: Column) -> Column:
    """round(x*4)/4 — quarter-point histograms (plumb_layout.py:144-148)."""
    return py_round(col * 4) / 4


def round_2dp(col: Column) -> Column:
    """Python round(x, 2). Half-to-even at the 2nd decimal.

    Used for spacing_info raw_gap_pt / estimated_space_width_pt
    (extractor.py:628-700). round(x,2) in CPython rounds the double x*100
    conceptually; we mirror via py_round(x*100)/100, which matches CPython
    for the magnitudes in play (|x| < 1e6 points; verified by unit tests
    against round() over a dense grid).
    """
    return py_round(col * 100) / 100
