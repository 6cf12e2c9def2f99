"""Byte-identity of the Spark line pipeline vs the pure-Python oracle.

The oracle (pdf_plumber_util_spark.oracle.pyref) restates the reference's
extractor semantics (core/extractor.py:200-340,500-585). For a set of
synthetic documents the Spark chain

  tokenize -> assign_line_ids (C1) -> build_segments (C3/C4) ->
  assemble_lines (O2/A1/W1/W2) -> drop_blank_lines (P1)

must reproduce the oracle exactly: text and text_proportional byte-wise,
spacing-info values bit-wise, gaps/bboxes/coverages bit-wise.
"""

import math

import pandas as pd
import pytest

from pdf_plumber_util_spark.oracle import pyref
from pdf_plumber_util_spark.sources.pages import build_doc, synth_pages
from pdf_plumber_util_spark.sources.render import layout_html
from pdf_plumber_util_spark.sources.tokenizer import page_dims, tokenize_pages
from pdf_plumber_util_spark.operators import (
    assemble_lines,
    assign_line_ids,
    build_segments,
    drop_blank_lines,
)

N_DOCS = 8


def _spark_lines(spark):
    pages = synth_pages(spark, N_DOCS)
    w = tokenize_pages(pages)
    wl = assign_line_ids(w)
    segs = build_segments(wl)
    lines = drop_blank_lines(assemble_lines(wl, segs, page_dims(w)))
    return lines.orderBy("url", "page", "line_number").toPandas()


def _oracle_lines():
    rows = []
    for i in range(N_DOCS):
        doc = build_doc(i)
        words = layout_html(doc["html"].decode())
        by_page = {}
        for w in words:
            by_page.setdefault(w["page"], []).append(w)
        pages = [
            pyref.build_lines(ws, p, 612.0, 792.0) for p, ws in sorted(by_page.items())
        ]
        for pd_ in pyref.drop_blank_lines(pages):
            for ln in pd_["lines"]:
                rows.append(
                    {
                        "url": doc["url"],
                        "page": pd_["page"],
                        "line_number": ln["line_number"],
                        "text": ln["text"],
                        "text_proportional": ln["text_proportional"],
                        "info": ln["proportional_spacing_info"],
                        "bbox": ln["bbox"],
                        "predominant_size": ln["predominant_size"],
                        "predominant_font": ln["predominant_font"],
                        "predominant_size_coverage": ln["predominant_size_coverage"],
                        "predominant_font_coverage": ln["predominant_font_coverage"],
                        "gap_before": ln["gap_before"],
                        "gap_after": ln["gap_after"],
                        "original_line_number": ln["original_line_number"],
                    }
                )
    return pd.DataFrame(rows).sort_values(["url", "page", "line_number"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def both(spark):
    return _spark_lines(spark), _oracle_lines()


def test_same_line_count(both):
    got, want = both
    assert len(got) == len(want) > 100


def test_text_byte_identical(both):
    got, want = both
    assert list(got["text"]) == list(want["text"])
    assert list(got["text_proportional"]) == list(want["text_proportional"])


def test_spacing_info_exact(both):
    got, want = both
    for g, w in zip(got["proportional_spacing_info"], want["info"]):
        g = [(x["normalized_text_index"], x["raw_gap_pt"], x["estimated_space_width_pt"], x["proportional_spaces"]) for x in g]
        w = [(x["normalized_text_index"], x["raw_gap_pt"], x["estimated_space_width_pt"], x["proportional_spaces"]) for x in w]
        assert g == w


def test_geometry_and_gaps_bitwise(both):
    got, want = both
    for col in ["gap_before", "gap_after"]:
        assert list(got[col]) == list(want[col]), col
    gb = [(b["x0"], b["top"], b["x1"], b["bottom"]) for b in got["bbox"]]
    wb = [(b["x0"], b["top"], b["x1"], b["bottom"]) for b in want["bbox"]]
    assert gb == wb


def test_predominant_and_coverage(both):
    got, want = both
    assert list(got["predominant_size"]) == list(want["predominant_size"])
    assert list(got["predominant_font"]) == list(want["predominant_font"])
    assert list(got["predominant_size_coverage"]) == list(want["predominant_size_coverage"])
    assert list(got["predominant_font_coverage"]) == list(want["predominant_font_coverage"])


def test_renumbering(both):
    got, want = both
    assert list(got["original_line_number"]) == list(want["original_line_number"])


# ---------------------------------------------------------------- C2 ----


def test_combine_words_x_vs_pyref(spark, sf_dir):
    """C2 parity: Spark combine_words_x vs the pure-Python oracle on the
    tight-pitch synthetic words (gaps 0.5-4.0 pt straddle the 3.0 pt
    tolerance, so real merges AND real breaks occur)."""
    from pdf_plumber_util_spark.operators import (
        assign_line_ids_window,
        combine_words_x,
    )
    from pdf_plumber_util_spark.sources.tables import words_from_lineitem

    words = words_from_lineitem(spark, sf_dir, tight_x=True)
    wl = assign_line_ids_window(words)
    got = (
        combine_words_x(wl)
        .orderBy("url", "page", "line_id", "x0")
        .select("url", "page", "line_id", "word_idx", "text", "x0", "x1",
                "top", "bottom", "fontname", "size")
        .toPandas()
    )
    # at least some merges must have happened (fewer merged words than words)
    n_words = wl.count()
    assert len(got) < n_words

    raw = wl.orderBy("url", "page", "line_id", "x0", "word_idx").toPandas()
    want_rows = []
    for (url, page, line_id), grp in raw.groupby(["url", "page", "line_id"], sort=True):
        members = grp.to_dict("records")
        for m in pyref.combine_words_x(members):
            want_rows.append(
                (url, page, line_id, m["word_idx"], m["text"], m["x0"], m["x1"],
                 m["top"], m["bottom"], m["fontname"], m["size"])
            )
    want = pd.DataFrame(
        want_rows, columns=["url", "page", "line_id", "word_idx", "text",
                            "x0", "x1", "top", "bottom", "fontname", "size"]
    ).sort_values(["url", "page", "line_id", "x0"], kind="stable").reset_index(drop=True)

    assert len(got) == len(want)
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col
