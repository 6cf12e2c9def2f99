"""Banker's-rounding column expressions must match CPython round() exactly.

These pin the byte-identity trap called out in SURVEY.md §7.4 (O4/O6):
Spark's builtin round() is half-away-from-zero; the reference quantizes
with Python round() (half-to-even) at helpers.py:8-13, extractor.py:395,679.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_plumber_util_spark.functions.rounding import (
    py_round,
    round_2dp,
    round_half,
    round_quarter,
    round_to_nearest,
)


def _eval(spark, values, expr_fn):
    df = spark.createDataFrame(pd.DataFrame({"v": values}))
    return [r["o"] for r in df.select(expr_fn(F.col("v")).alias("o")).collect()]


def test_py_round_grid(spark):
    vals = list(np.arange(-25, 25, 0.25)) + [0.5, 1.5, 2.5, -0.5, -1.5, -2.5]
    got = _eval(spark, vals, py_round)
    want = [float(round(v)) for v in vals]
    assert got == want


def test_round_to_nearest_half(spark):
    # FIXTURES.md §9 exact cases
    cases = {12.3: 12.5, 12.1: 12.0, 12.7: 12.5, 12.25: 12.0, 12.75: 13.0}
    got = _eval(spark, list(cases), lambda c: round_to_nearest(c, 0.5))
    assert got == [round(v / 0.5) * 0.5 for v in cases]
    assert got == list(cases.values())


def test_round_to_nearest_quarter(spark):
    vals = [12.3, 12.15, 12.125, 0.375, -3.125]
    got = _eval(spark, vals, lambda c: round_to_nearest(c, 0.25))
    assert got == [round(v / 0.25) * 0.25 for v in vals]


def test_round_half_and_quarter(spark):
    vals = list(np.arange(0, 30, 0.125))
    assert _eval(spark, vals, round_half) == [round(v * 2) / 2 for v in vals]
    assert _eval(spark, vals, round_quarter) == [round(v * 4) / 4 for v in vals]


def test_round_2dp_dense_grid(spark):
    rng = np.random.default_rng(7)
    vals = list(np.round(rng.uniform(-600, 600, 4000), 4)) + [
        2.675, 0.145, 0.615, 12.25, -3.005, 35.0, 12.2544,
    ]
    got = _eval(spark, vals, round_2dp)
    want = [round(v * 100) / 100 for v in vals]
    assert got == want
