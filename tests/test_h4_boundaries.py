"""H4 iterative boundary operator vs the pyref oracle on rendered docs."""

import pytest
from pyspark.sql import functions as F

from pdf_plumber_util_spark.operators.boundaries_iterative import iterative_boundaries
from pdf_plumber_util_spark.operators.spacing import line_spacing_summary
from pdf_plumber_util_spark.oracle import pyref
from pdf_plumber_util_spark.plans.extract import extract_lines
from pdf_plumber_util_spark.sources.pages import build_doc, synth_pages
from pdf_plumber_util_spark.sources.render import layout_html

N_DOCS = 6


def test_h4_matches_oracle(spark):
    pages = synth_pages(spark, N_DOCS)
    lines = extract_lines(pages).persist()
    base = line_spacing_summary(lines)
    got = {
        r["url"]: (r["header_bottom"], r["footer_top"])
        for r in iterative_boundaries(lines, base).collect()
    }
    base_vals = {r["url"]: r["most_common_spacing"] for r in base.collect()}
    assert len(got) == N_DOCS

    from collections import Counter

    for i in range(N_DOCS):
        doc = build_doc(i)
        words = layout_html(doc["html"].decode())
        by_page = {}
        for w in words:
            by_page.setdefault(w["page"], []).append(w)
        pl = [pyref.build_lines(ws, p, 612.0, 792.0) for p, ws in sorted(by_page.items())]
        pl = pyref.drop_blank_lines(pl)
        hv, fv = [], []
        for pd_ in pl:
            h, f = pyref.h4_page_boundaries(
                pd_["lines"], 792.0, base_vals[doc["url"]]
            )
            hv.append(h)
            fv.append(f)
        want_h = Counter(hv).most_common(1)[0][0]
        want_f = Counter(fv).most_common(1)[0][0]
        assert got[doc["url"]] == (want_h, want_f), doc["url"]
        # the rendered header/footer furniture must actually be cut
        assert got[doc["url"]][0] >= 44.0  # header line bottom = 36+8
        assert got[doc["url"]][1] <= 748.0  # footer line top = 748
