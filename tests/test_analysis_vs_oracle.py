"""Analysis layer (rules, classification, blocks, boundaries, body text)
vs the pure-Python oracle — including the flagship byte-identity check:
extracted main-content text per url must match exactly.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_plumber_util_spark.oracle import pyref
from pdf_plumber_util_spark.plans.extract import extract_documents
from pdf_plumber_util_spark.sources.pages import build_doc, synth_pages
from pdf_plumber_util_spark.sources.render import layout_html
from pdf_plumber_util_spark.sources.tokenizer import page_dims, tokenize_pages
from pdf_plumber_util_spark.operators import (
    assemble_lines,
    assign_line_ids,
    build_segments,
    drop_blank_lines,
    contextual_spacing_rules,
    classify_gaps,
    form_blocks,
    header_footer_candidates,
    final_boundaries,
    body_text,
)

N_DOCS = 8


def _oracle_pages(i):
    doc = build_doc(i)
    words = layout_html(doc["html"].decode())
    by_page = {}
    for w in words:
        by_page.setdefault(w["page"], []).append(w)
    pages = [pyref.build_lines(ws, p, 612.0, 792.0) for p, ws in sorted(by_page.items())]
    return doc["url"], pyref.drop_blank_lines(pages)


@pytest.fixture(scope="module")
def spark_frames(spark):
    pages = synth_pages(spark, N_DOCS)
    w = tokenize_pages(pages)
    wl = assign_line_ids(w)
    segs = build_segments(wl)
    flines = drop_blank_lines(assemble_lines(wl, segs, page_dims(w)))
    flines = flines.cache()
    rules = contextual_spacing_rules(flines)
    return flines, segs, rules


@pytest.fixture(scope="module")
def oracle_docs():
    return dict(_oracle_pages(i) for i in range(N_DOCS))


def test_spacing_rules(spark_frames, oracle_docs):
    _, _, rules = spark_frames
    got = {
        (r["url"], r["context_size"]): r
        for r in rules.collect()
    }
    n_checked = 0
    for url, pages in oracle_docs.items():
        all_lines = [ln for p in pages for ln in p["lines"]]
        want = pyref.spacing_rules(pyref.collect_contextual_gaps(all_lines))
        want_keys = {(url, cs) for cs in want}
        got_keys = {k for k in got if k[0] == url}
        assert got_keys == want_keys
        for cs, wr in want.items():
            gr = got[(url, cs)]
            assert gr["most_common_gap"] == wr["most_common_gap"], (url, cs)
            assert gr["range_hi"] == wr["line_spacing_range"][1]
            assert gr["para_spacing_max"] == wr["para_spacing_max"]
            assert gr["total_gaps"] == wr["total_gaps"]
            assert gr["total_lines"] == wr["total_lines"]
            n_checked += 1
    assert n_checked > 5


def test_classification(spark_frames, oracle_docs):
    flines, _, rules = spark_frames
    got = classify_gaps(flines, rules).select(
        "url", "page", "line_number", "gap_type"
    ).collect()
    gmap = {(r["url"], r["page"], r["line_number"]): r["gap_type"] for r in got}
    for url, pages in oracle_docs.items():
        all_lines = [ln for p in pages for ln in p["lines"]]
        wr = pyref.spacing_rules(pyref.collect_contextual_gaps(all_lines))
        for p in pages:
            for ln in p["lines"]:
                want = pyref.classify_gap(ln["gap_before"], ln["predominant_size"], wr)
                assert gmap[(url, p["page"], ln["line_number"])] == want


def test_blocks(spark_frames, oracle_docs):
    flines, segs, rules = spark_frames
    blocks = form_blocks(flines, rules, segments=segs)
    got = blocks.orderBy("url", "page", "block_id").collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["url"], []).append(r)
    for url, pages in oracle_docs.items():
        all_lines = [ln for p in pages for ln in p["lines"]]
        wr = pyref.spacing_rules(pyref.collect_contextual_gaps(all_lines))
        want = pyref.form_blocks(pages, wr)
        want_blocks = [b for pg in want for b in pg["blocks"]]
        got_blocks = by_doc[url]
        assert len(got_blocks) == len(want_blocks), url
        for g, w in zip(got_blocks, want_blocks):
            assert g["text"] == w["text"]
            assert g["predominant_size"] == w["predominant_size"]
            assert (g["bbox"]["x0"], g["bbox"]["top"], g["bbox"]["x1"], g["bbox"]["bottom"]) == (
                w["bbox"]["x0"], w["bbox"]["top"], w["bbox"]["x1"], w["bbox"]["bottom"])
            assert g["gap_before"] == w["gap_before"]
            assert g["gap_after"] == w["gap_after"]
            assert g["size_coverage"] == w["size_coverage"]
            assert g["predominant_font"] == w["predominant_font"]
            assert g["font_coverage"] == w["font_coverage"]


def test_boundaries_and_body(spark_frames, oracle_docs):
    flines, _, rules = spark_frames
    cands = header_footer_candidates(flines)
    doc_bottom = flines.groupBy("url").agg(
        F.max(F.col("bbox")["bottom"]).alias("doc_bottom")
    )
    bounds = final_boundaries(cands, doc_bottom)
    got = {r["url"]: (r["header_bottom"], r["footer_top"]) for r in bounds.collect()}

    blocks = form_blocks(flines, rules)
    body = body_text(blocks, bounds)
    got_body = {r["url"]: r["body_text"] for r in body.collect()}

    for url, pages in oracle_docs.items():
        all_lines = [ln for p in pages for ln in p["lines"]]
        hv = [c["y_coord"] for c in pyref.header_footer_candidates(pages, "header")]
        fv = [c["y_coord"] for c in pyref.header_footer_candidates(pages, "footer")]
        doc_bot = max(ln["bbox"]["bottom"] for ln in all_lines)
        hb, ft = pyref.final_boundaries(hv, fv, doc_bot)
        assert got[url] == (hb, ft), url
        # flagship byte-identity
        assert got_body[url] == pyref.extract_body_text(
            [dict(p) for p in pages]
        ), url


def test_flagship_plan_end_to_end(spark, oracle_docs):
    docs = extract_documents(synth_pages(spark, N_DOCS))
    got = {r["url"]: r["body_text"] for r in docs.collect()}
    assert len(got) == N_DOCS
    for url, pages in oracle_docs.items():
        assert got[url] == pyref.extract_body_text([dict(p) for p in pages]), url
