"""Ports of the reference's own conftest fixtures + analyzer unit cases
(north-rule: "porting pdf_plumber_util's own pytest fixtures").

Sources:
  /root/reference/tests/conftest.py:17-112 (sample_lines_data,
      sample_spacing_rules)
  /root/reference/tests/unit/test_analyzer.py (TestPDFAnalyzer:
      test_collect_contextual_gaps, test_classify_gap_contextual,
      test_classify_gap_fallback, test_analyze_contextual_spacing)

The reference feeds dicts into PDFAnalyzer methods; here the same data
flows through the Spark operators (A6 contextual_gaps, A7
contextual_spacing_rules, O1 classify_gaps) and must reproduce the
reference's asserted classifications and rule values exactly.
"""

import pytest
from pyspark.sql import functions as F

from pdf_plumber_util_spark.operators.spacing import (
    classify_gaps,
    contextual_gaps,
    contextual_spacing_rules,
)


def _sample_rules_df(spark):
    """conftest.py:83-112 sample_spacing_rules as our rules schema.

    12pt: line_spacing_range (5,7) -> range_hi 7.0, para_max 13.2,
          total_gaps 17 (the url's dominant context)
    14pt: range (6,8) -> range_hi 8.0, para_max 15.4, total_gaps 9
    first_ctx_pos follows dict insertion order (12 before 14), matching
    the reference's Counter tie-break.
    """
    return spark.createDataFrame(
        [
            ("u", 12.0, 6.0, 7.0, 13.2, 17, 1),
            ("u", 14.0, 7.0, 8.0, 15.4, 9, 2),
        ],
        "url string, context_size double, most_common_gap double, "
        "range_hi double, para_spacing_max double, total_gaps long, "
        "first_ctx_pos long",
    )


def _classify_one(spark, rules, gap, size):
    df = spark.createDataFrame(
        [("u", size, gap)], "url string, predominant_size double, gap_before double"
    )
    return classify_gaps(df, rules).collect()[0]["gap_type"]


def test_classify_gap_contextual(spark):
    """test_analyzer.py test_classify_gap_contextual: at the 12pt context
    6.0 is Line, 12.0 is Paragraph, 18.0 is Section."""
    rules = _sample_rules_df(spark)
    assert _classify_one(spark, rules, 6.0, 12.0) == "Line"
    assert _classify_one(spark, rules, 12.0, 12.0) == "Paragraph"
    assert _classify_one(spark, rules, 18.0, 12.0) == "Section"


def test_classify_gap_14pt_context(spark):
    """Same boundaries at the 14pt context of sample_spacing_rules."""
    rules = _sample_rules_df(spark)
    assert _classify_one(spark, rules, 7.0, 14.0) == "Line"
    assert _classify_one(spark, rules, 14.0, 14.0) == "Paragraph"
    assert _classify_one(spark, rules, 21.0, 14.0) == "Section"


def test_classify_gap_fallback_empty_rules(spark):
    """test_analyzer.py test_classify_gap_fallback: no rules at all ->
    default 'Line' (analyzer.py:240)."""
    empty = _sample_rules_df(spark).limit(0)
    assert _classify_one(spark, empty, 6.0, 99.0) == "Line"


def test_classify_gap_fallback_unknown_context(spark):
    """analyzer.py:232-238: an unknown context size falls back to the
    context with the most total_gaps (12pt, 17 > 9), NOT to a default —
    so 12.0 at size 99 classifies as Paragraph via the 12pt rules."""
    rules = _sample_rules_df(spark)
    assert _classify_one(spark, rules, 6.0, 99.0) == "Line"
    assert _classify_one(spark, rules, 12.0, 99.0) == "Paragraph"
    assert _classify_one(spark, rules, 18.0, 99.0) == "Section"


def _sample_lines_df(spark, with_third_line=True):
    """conftest.py:17-73 sample_lines_data (+ the third 12pt line that
    test_collect_contextual_gaps appends so a same-size adjacency exists)."""
    rows = [
        ("u", 1, 1, "Chapter 1: Introduction", 14.0, "Arial-Bold", 18.0),
        ("u", 1, 2, "This is the first paragraph of body text.", 12.0, "Arial", 12.0),
    ]
    if with_third_line:
        rows.append(("u", 1, 3, "Second paragraph line.", 12.0, "Arial", 6.0))
    return spark.createDataFrame(
        rows,
        "url string, page int, line_number int, text string, "
        "predominant_size double, predominant_font string, gap_before double",
    )


def test_collect_contextual_gaps(spark):
    """test_analyzer.py test_collect_contextual_gaps, with the value-level
    assertion the reference leaves implicit: only line 3 qualifies (its
    predecessor shares the 12pt predominant size), so A6 yields exactly
    one gap — context 12.0, rounded gap 6.0."""
    got = contextual_gaps(_sample_lines_df(spark)).collect()
    assert len(got) == 1
    assert got[0]["context_size"] == 12.0
    assert got[0]["rounded_gap"] == 6.0


def test_collect_contextual_gaps_no_adjacency(spark):
    """Without the third line no same-size adjacency exists -> no gaps
    (the reference's 'may be 0 if no same-size consecutive lines')."""
    assert contextual_gaps(_sample_lines_df(spark, with_third_line=False)).count() == 0


def test_analyze_contextual_spacing(spark):
    """test_analyzer.py test_analyze_contextual_spacing: gaps
    [6,6,6,12,18] in the 12pt context -> most_common_gap 6.0,
    para_spacing_max 13.2 (12*1.1), line range (4.8, 7.2) = 6 * 0.8/1.2."""
    # line 1 has no predecessor so its gap never qualifies; the A6
    # collector sees exactly the reference's [6, 6, 6, 12, 18]
    gaps_before = [4.0, 6.0, 6.0, 6.0, 12.0, 18.0]
    rows = [
        ("u", 1, i + 1, f"line {i}", 12.0, "Arial", g)
        for i, g in enumerate(gaps_before)
    ]
    lines = spark.createDataFrame(
        rows,
        "url string, page int, line_number int, text string, "
        "predominant_size double, predominant_font string, gap_before double",
    )
    rules = contextual_spacing_rules(lines).collect()
    assert len(rules) == 1
    r = rules[0]
    assert r["context_size"] == 12.0
    assert r["most_common_gap"] == 6.0
    assert r["para_spacing_max"] == pytest.approx(13.2)
    assert r["range_lo"] == pytest.approx(4.8)
    assert r["range_hi"] == pytest.approx(7.2)
    assert r["total_gaps"] == 5
    assert r["total_lines"] == 6


# ---------------------------------------------------------------------------
# PageSampler structural cases (reference tests/unit/test_sampling.py).
# The reference seeds `random`; M1 is hash-seeded (cluster-invariant), so
# the *structural* assertions port exactly while specific page numbers
# differ by design (SURVEY.md §4 custom-work item 5).
# ---------------------------------------------------------------------------

from pdf_plumber_util_spark.operators.sampling import (  # noqa: E402
    sample_header_footer_groups,
)


def _m1(spark, total, **kw):
    pages = spark.createDataFrame(
        [("u", p) for p in range(1, total + 1)], "url string, page int"
    )
    rows = sample_header_footer_groups(pages, **kw).collect()
    return {
        "all": sorted(r["page"] for r in rows if r["kind"] == "all"),
        "group": sorted(r["page"] for r in rows if r["kind"] == "group"),
        "individual": sorted(r["page"] for r in rows if r["kind"] == "individual"),
        "n": len(rows),
    }


def test_small_document_returns_all_pages(spark):
    """test_sampling.py:16 — 3-page doc (< 16 requested) takes every page,
    in order, with no groups."""
    got = _m1(spark, 3)
    assert got["all"] == [1, 2, 3]
    assert got["group"] == [] and got["individual"] == []
    assert got["n"] == 3


def test_boundary_case_exact_requested_size(spark):
    """test_sampling.py:43 — 16 pages == 3*4+4 requested -> still take-all."""
    got = _m1(spark, 16)
    assert got["all"] == list(range(1, 17))
    assert got["group"] == [] and got["individual"] == []


def test_single_page_document(spark):
    """test_sampling.py:206 — 1-page doc returns that page, no groups."""
    got = _m1(spark, 1)
    assert got["all"] == [1] and got["n"] == 1


def test_large_document_uses_sampling(spark):
    """test_sampling.py:66 — 50 pages -> exactly 3 groups of 4 consecutive
    pages + 4 individuals, disjoint, 16 total."""
    got = _m1(spark, 50)
    assert got["all"] == []
    assert len(got["group"]) == 12 and len(got["individual"]) == 4
    assert got["n"] == 16
    # groups are runs of 4 consecutive pages: the 12 group pages must
    # partition into 3 runs whose spans don't touch each other
    runs = []
    for p in got["group"]:
        if runs and p == runs[-1][-1] + 1 and len(runs[-1]) < 4:
            runs[-1].append(p)
        else:
            runs.append([p])
    assert [len(r) for r in runs] == [4, 4, 4]
    assert set(got["group"]).isdisjoint(got["individual"])


def test_no_overlap_guarantee(spark):
    """test_sampling.py:142 — 100 pages: no page selected twice."""
    got = _m1(spark, 100)
    picked = got["group"] + got["individual"]
    assert len(picked) == len(set(picked)) == 16


def test_insufficient_pages_for_groups(spark):
    """test_sampling.py:176 — 18 pages (> 16) uses complex sampling;
    selection stays in bounds with reasonable coverage."""
    got = _m1(spark, 18)
    picked = got["group"] + got["individual"]
    assert 10 <= len(picked) <= 18
    assert all(1 <= p <= 18 for p in picked)


def test_custom_parameters(spark):
    """test_sampling.py:109 — 30 pages, 2 groups of 3 + 2 individuals."""
    got = _m1(spark, 30, group_size=3, n_groups=2, n_individuals=2)
    assert len(got["group"]) == 6 and len(got["individual"]) == 2
    assert set(got["group"]).isdisjoint(got["individual"])


def test_zero_individuals_parameter(spark):
    """test_sampling.py:229 — individuals=0 -> groups only (12 pages)."""
    got = _m1(spark, 30, group_size=4, n_groups=3, n_individuals=0)
    assert len(got["group"]) == 12 and got["individual"] == []
    assert got["n"] == 12


def test_zero_groups_parameter(spark):
    """test_sampling.py:256 — groups=0 -> individuals only (8 pages)."""
    got = _m1(spark, 30, group_size=4, n_groups=0, n_individuals=8)
    assert got["group"] == [] and len(got["individual"]) == 8
    assert got["n"] == 8


def test_deterministic_sampling(spark):
    """test_sampling.py:308 — same input -> identical selection (M1 is
    hash-ranked, so determinism holds on any partitioning, stronger than
    the reference's same-seed guarantee)."""
    assert _m1(spark, 50) == _m1(spark, 50)
