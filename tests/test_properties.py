"""Property-based tests (hypothesis) for the pure kernels whose byte-
identity claims anchor the rest of the engine.

Spark round-trips are batched: each hypothesis example is a LIST of
values evaluated in one job (a per-value job would be pathologically
slow), with deadline disabled because JVM latency is not the property
under test.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pdf_plumber_util_spark.operators.lines import _cluster_anchor


def _cluster_anchor_oracle(tops: list[float], y_tol: float) -> list[int]:
    """Direct transcription of the reference's anchor loop
    (extractor.py:221-235): break when top - anchor > tol; the anchor is
    the top that STARTED the cluster."""
    ids = []
    line = -1
    anchor = None
    for t in tops:
        if anchor is None or t - anchor > y_tol:
            line += 1
            anchor = t
        ids.append(line)
    return ids


@given(
    tops=st.lists(
        st.floats(min_value=0.0, max_value=1e4, allow_nan=False, width=64),
        min_size=0,
        max_size=200,
    ),
    y_tol=st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_cluster_anchor_matches_reference_loop(tops, y_tol):
    tops = sorted(tops)
    got = _cluster_anchor(np.array(tops, dtype=np.float64), y_tol).tolist()
    assert got == _cluster_anchor_oracle(tops, y_tol)


@given(
    tops=st.lists(
        st.floats(min_value=0.0, max_value=1e4, allow_nan=False, width=64),
        min_size=1,
        max_size=100,
    ),
    y_tol=st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_cluster_anchor_invariants(tops, y_tol):
    tops = np.array(sorted(tops), dtype=np.float64)
    ids = _cluster_anchor(tops, y_tol)
    # ids are 0-based, consecutive, nondecreasing
    assert ids[0] == 0
    steps = np.diff(ids)
    assert set(steps.tolist()) <= {0, 1}
    # every member is within tol of its cluster's anchor (first member)
    for line in range(ids.max() + 1):
        member_tops = tops[ids == line]
        assert np.all(member_tops - member_tops[0] <= y_tol)


# ---- Spark Column kernels vs CPython, batched per example ----


def _spark_eval(spark, values, colfn, in_type="double"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["o"] for r in df.select(colfn("v").alias("o")).collect()]


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=64
        ),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=12, deadline=None)
def test_py_round_matches_cpython(spark, values):
    from pyspark.sql import functions as F

    from pdf_plumber_util_spark.functions.rounding import py_round

    got = _spark_eval(spark, values, lambda c: py_round(F.col(c)))
    want = [float(round(v)) for v in values]
    assert got == want


@given(
    values=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=64),
        min_size=1,
        max_size=300,
    ),
    step=st.sampled_from([0.25, 0.5, 1.0, 2.0]),
)
@settings(max_examples=12, deadline=None)
def test_round_to_nearest_matches_cpython(spark, values, step):
    from pyspark.sql import functions as F

    from pdf_plumber_util_spark.functions.rounding import round_to_nearest

    got = _spark_eval(spark, values, lambda c: round_to_nearest(F.col(c), step))
    want = [float(round(v / step) * step) for v in values]
    assert got == want


@given(
    values=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=12, deadline=None)
def test_normalize_line_matches_cpython(spark, values):
    import re

    from pyspark.sql import functions as F

    from pdf_plumber_util_spark.functions.text import normalize_line

    got = _spark_eval(spark, values, lambda c: normalize_line(F.col(c)),
                      in_type="string")
    want = [re.sub(r"\s+", " ", v).strip() for v in values]
    assert got == want
