"""H4: iterative block-based header/footer boundary (analyzer_head.py:26-228).

The most refined boundary variant in the reference: walk a page's lines
top-down, growing a tentative header block; a gap >= 1.8 x base_spacing
ends it (boundary = block bottom), a gap < 1.3 x base continues the block,
an ambiguous gap records a tentative boundary but keeps scanning; mirrored
bottom-up for the footer; results rounded to 0.1; per-document boundary =
modal candidate y across pages (first-seen tie-break).

Genuinely sequential within a page (the tentative state feeds forward), so
this is one of the two sanctioned applyInPandas operators (SURVEY §2.9).
Work per group is bounded by lines-per-document.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def page_boundaries_iterative(
    lines_pdf: pd.DataFrame,
    page_height: float,
    base_spacing: float,
    header_zone_pt: float = 90.0,
    footer_zone_in: float = 1.0,
    large_mult: float = 1.8,
    small_mult: float = 1.3,
) -> tuple[float, float]:
    """Pure-pandas walk for one page (rows sorted by top). Returns
    (header_bottom, footer_top) rounded to 0.1."""
    tops = lines_pdf["top"].to_list()
    bottoms = lines_pdf["bottom"].to_list()
    n = len(tops)
    footer_min_y = page_height - footer_zone_in * 72.0
    large = base_spacing * large_mult
    small = base_spacing * small_mult

    header_y = 0.0
    header_any = False
    last_in_zone_bottom = 0.0
    for i in range(n):
        top, bottom = tops[i], bottoms[i]
        if i == 0 and top >= header_zone_pt:
            header_y = 0.0
            break
        if top < header_zone_pt:
            last_in_zone_bottom = max(last_in_zone_bottom, bottom)
            header_any = True
            if i + 1 < n:
                gap = max(tops[i + 1] - bottom, 0.0)
                if gap >= large:
                    header_y = bottom
                    break
                if gap < small:
                    pass
                else:
                    header_y = bottom
            else:
                header_y = bottom
                break
        else:
            if not header_any:
                header_y = 0.0
            elif header_y == 0.0:
                header_y = last_in_zone_bottom
            break

    footer_y = page_height
    footer_any = False
    first_in_zone_top = page_height
    for i in range(n - 1, -1, -1):
        top, bottom = tops[i], bottoms[i]
        if i == n - 1 and bottom <= footer_min_y:
            footer_y = page_height
            break
        if bottom > footer_min_y:
            first_in_zone_top = min(first_in_zone_top, top)
            footer_any = True
            if i - 1 >= 0:
                gap = max(top - bottoms[i - 1], 0.0)
                if gap >= large:
                    footer_y = top
                    break
                if gap < small:
                    pass
                else:
                    footer_y = top
            else:
                footer_y = top
                break
        else:
            if not footer_any:
                footer_y = page_height
            elif footer_y == page_height:
                footer_y = first_in_zone_top
            break

    return round(header_y, 1), round(footer_y, 1)


def iterative_boundaries(lines: DataFrame, base_spacing: DataFrame,
                         header_zone_pt: float = 90.0,
                         footer_zone_in: float = 1.0,
                         large_mult: float = 1.8,
                         small_mult: float = 1.3) -> DataFrame:
    """Per-url H4 boundaries: per-page iterative candidates + modal vote.

    Args:
      lines: blank-filtered line table (needs bbox, page_height).
      base_spacing: per-url (url, most_common_spacing) — A4 output.
    Returns (url, header_bottom, footer_top, n_pages_voted).
    """
    slim = lines.select(
        "url", "page", "line_number",
        F.col("bbox")["top"].alias("top"),
        F.col("bbox")["bottom"].alias("bottom"),
        "page_height",
    ).join(base_spacing.select("url", "most_common_spacing"), "url", "inner")

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        base = float(pdf["most_common_spacing"].iloc[0])
        ph = float(pdf["page_height"].iloc[0])
        rows = []
        for page, grp in pdf.sort_values(["page", "line_number"]).groupby("page", sort=True):
            h, f = page_boundaries_iterative(
                grp, ph, base, header_zone_pt, footer_zone_in, large_mult, small_mult
            )
            rows.append({"url": url, "page": int(page), "header_y": h, "footer_y": f})
        return pd.DataFrame(rows)

    cands = slim.groupBy("url").applyInPandas(
        per_doc, schema="url string, page int, header_y double, footer_y double"
    )

    def vote(col: str, out: str) -> DataFrame:
        per_y = cands.groupBy("url", col).agg(
            F.count("*").alias("cnt"), F.min("page").alias("fs")
        )
        return per_y.groupBy("url").agg(
            F.max_by(col, F.struct("cnt", -F.col("fs"))).alias(out)
        )

    n = cands.groupBy("url").agg(F.count("*").cast("long").alias("n_pages_voted"))
    return (
        vote("header_y", "header_bottom")
        .join(vote("footer_y", "footer_top"), "url")
        .join(n, "url")
    )
