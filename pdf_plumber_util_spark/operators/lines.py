"""Word -> line -> segment -> line-text operators (reference extractor core).

Covers SURVEY.md §2 operators C1-C5, O2, A1, W1/W2, P1 as pure DataFrame
transformations. Everything is keyed by a ``url`` prefix, so after one
hash-partition by ``url`` the whole chain runs without further exchanges
(HashPartitioning(url) satisfies ClusteredDistribution(url, page, ...)).

Input word schema (tokenizer output, FIXTURES.md §2):
  url string, page int, word_idx int, text string, x0 double, x1 double,
  top double, bottom double, fontname string, size double, upright boolean
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import py_round, round_half, round_2dp

# window: words of one page in line order
_W_PAGE = ["url", "page"]


def _cluster_anchor(tops: np.ndarray, y_tol: float) -> np.ndarray:
    """C1 anchor clustering over sorted tops (extractor.py:221-235).

    The reference breaks a line when ``word.top - anchor > y_tol`` where the
    anchor is the top of the word that *started* the cluster (updated only on
    break) — NOT the previous word (cumulative drift differs from a lag-based
    flag). With tops ascending, each cluster is the maximal prefix with
    ``top - anchor <= y_tol``, found per cluster with one searchsorted —
    O(total_words) per page, no per-row Python.
    """
    n = len(tops)
    line_ids = np.zeros(n, dtype=np.int64)
    start = 0
    line = 0
    while start < n:
        # subtract-form matches reference float semantics exactly
        d = tops[start:] - tops[start]
        end = start + int(np.searchsorted(d, y_tol, side="right"))
        line_ids[start:end] = line
        line += 1
        start = end
    return line_ids


def assign_line_ids(words: DataFrame, y_tol: float = 3.0) -> DataFrame:
    """C1: add ``line_id`` (0-based, per page, in top order).

    Grouped by ``url`` (whole documents are bounded: pages x words/page),
    vectorized inside with numpy searchsorted. This is the pipeline's single
    shuffle; every downstream window reuses the url partitioning.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    cols = [f.name for f in words.schema.fields if f.name != "line_id"]
    schema = StructType(
        [f for f in words.schema.fields if f.name != "line_id"]
        + [StructField("line_id", LongType())]
    )

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["page", "top", "word_idx"], kind="stable")
        out = []
        for _, grp in pdf.groupby("page", sort=True):
            tops = grp["top"].to_numpy()
            g = grp.copy()
            g["line_id"] = _cluster_anchor(tops, y_tol)
            out.append(g)
        return pd.concat(out)[cols + ["line_id"]]

    return words.groupBy("url").applyInPandas(per_doc, schema=schema)


def combine_words_x(words: DataFrame, x_tol: float = 3.0) -> DataFrame:
    """C2 (extractor.py:417-460): merge consecutive words in a line when
    ``abs(next.x0 - cur.x1) <= x_tol``. The running value compared against is
    always the *previous word's* x1 (merged or not), so the chain is exactly
    lag-expressible: flag + cumulative sum + order-preserving concat.
    Requires ``line_id``. Emits merged words (text concatenated, x1 of the
    last member, other attrs from the first member).
    """
    w = Window.partitionBy("url", "page", "line_id").orderBy("x0", "word_idx")
    flag = F.when(
        F.abs(F.col("x0") - F.lag("x1").over(w)) <= F.lit(x_tol), F.lit(0)
    ).otherwise(F.lit(1))
    df = words.withColumn("_grp", F.sum(flag).over(w))
    ordered = F.array_sort(
        F.collect_list(F.struct("x0", "word_idx", "text", "x1")).over(
            Window.partitionBy("url", "page", "line_id", "_grp")
        )
    )
    agg = (
        df.withColumn("_members", ordered)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url", "page", "line_id", "_grp").orderBy(
                    "x0", "word_idx"
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .withColumn(
            "text",
            F.aggregate("_members", F.lit(""), lambda acc, m: F.concat(acc, m["text"])),
        )
        .withColumn("x1", F.element_at("_members", -1)["x1"])
        .drop("_members", "_rn", "_grp")
    )
    return agg


def build_segments(words_with_lines: DataFrame) -> DataFrame:
    """C3/C4: font/size/upright run split + segment aggregate
    (extractor.py:342-399).

    Output: one row per segment with
      url, page, line_id, seg_id, font, reported_size, rounded_size,
      direction, text (concatenated, stripped), bbox struct, seg_width.
    """
    w = Window.partitionBy("url", "page", "line_id").orderBy("x0", "word_idx")
    brk = (
        ~F.col("fontname").eqNullSafe(F.lag("fontname").over(w))
        | ~F.col("size").eqNullSafe(F.lag("size").over(w))
        | ~F.col("upright").eqNullSafe(F.lag("upright").over(w))
    )
    df = words_with_lines.withColumn(
        "seg_id",
        F.sum(F.when(F.lag("word_idx").over(w).isNull() | brk, 1).otherwise(0)).over(w),
    )
    seg_w = Window.partitionBy("url", "page", "line_id", "seg_id")
    ordered = F.array_sort(
        F.collect_list(F.struct("x0", "word_idx", "text")).over(seg_w)
    )
    first = F.min(F.struct("x0", "word_idx", "fontname", "size", "upright")).over(seg_w)
    segs = (
        df.withColumn("_members", ordered)
        .withColumn("_first", first)
        .withColumn("_bx0", F.min("x0").over(seg_w))
        .withColumn("_btop", F.min("top").over(seg_w))
        .withColumn("_bx1", F.max("x1").over(seg_w))
        .withColumn("_bbot", F.max("bottom").over(seg_w))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url", "page", "line_id", "seg_id").orderBy(
                    "x0", "word_idx"
                )
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    # segment text: plain concat of member texts in (x0, word_idx) order,
    # then Python-str.strip() (extractor.py:375-399)
    raw_text = F.aggregate("_members", F.lit(""), lambda acc, m: F.concat(acc, m["text"]))
    return segs.select(
        "url",
        "page",
        "line_id",
        "seg_id",
        F.col("_first")["fontname"].alias("font"),
        F.col("_first")["size"].alias("reported_size"),
        round_half(F.coalesce(F.col("_first")["size"], F.lit(0.0))).alias("rounded_size"),
        F.when(F.coalesce(F.col("_first")["upright"], F.lit(True)), F.lit("upright"))
        .otherwise(F.lit("rotated"))
        .alias("direction"),
        F.regexp_replace(raw_text, r"(?U)^\s+|\s+$", "").alias("text"),
        F.struct(
            F.col("_bx0").alias("x0"),
            F.col("_btop").alias("top"),
            F.col("_bx1").alias("x1"),
            F.col("_bbot").alias("bottom"),
        ).alias("bbox"),
        (F.col("_bx1") - F.col("_bx0")).alias("seg_width"),
    )


def _line_text_exprs(segs: DataFrame) -> DataFrame:
    """O2 proportional spacing (extractor.py:628-700), columnar.

    Works on surviving (non-empty-text) segments; emits per-segment helper
    columns, then the caller aggregates per line.
    """
    surv = segs.filter(F.col("text") != "")
    ws = Window.partitionBy("url", "page", "line_id").orderBy("seg_id")
    surv = (
        surv.withColumn("_sidx", F.row_number().over(ws))
        .withColumn("_prev_x1", F.lag(F.col("bbox")["x1"]).over(ws))
        .withColumn(
            "_prev_size",
            F.lag(
                # reference: rounded_size or reported_size or 10 (falsy coalesce)
                F.when(F.col("rounded_size") != 0.0, F.col("rounded_size"))
                .otherwise(F.coalesce("reported_size", F.lit(10.0)))
            ).over(ws),
        )
        .withColumn(
            "_cum_len",
            F.coalesce(
                F.sum(F.length("text")).over(ws.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
    )
    raw_gap = F.col("bbox")["x0"] - F.col("_prev_x1")
    est = F.col("_prev_size") * 0.3
    n_spaces = F.greatest(F.lit(1.0), py_round(raw_gap / est)).cast("int")
    return surv.select(
        "url",
        "page",
        "line_id",
        "_sidx",
        "text",
        F.when(F.col("_sidx") > 1, n_spaces).alias("_nsp"),
        F.when(F.col("_sidx") > 1, round_2dp(raw_gap)).alias("_raw_gap"),
        F.when(F.col("_sidx") > 1, round_2dp(est)).alias("_est"),
        (F.col("_cum_len") + F.col("_sidx") - 2).cast("int").alias("_norm_idx"),
    )


def line_texts_from_segments(segments: DataFrame) -> DataFrame:
    """O2 aggregation: per (url, page, line_id) the normalized text,
    proportional text, and spacing-info array (extractor.py:628-700).
    Public so the reference's golden spacing-reconstruction fixtures can be
    replayed on injected segment rows."""
    o2 = _line_text_exprs(segments)
    lw = Window.partitionBy("url", "page", "line_id")
    return (
        o2.withColumn(
            "_parts", F.array_sort(F.collect_list(F.struct("_sidx", "text", "_nsp")).over(lw))
        )
        .withColumn(
            "_info",
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_sidx") > 1,
                        F.struct(
                            F.col("_sidx").alias("s"),
                            F.col("_norm_idx").alias("normalized_text_index"),
                            F.col("_raw_gap").alias("raw_gap_pt"),
                            F.col("_est").alias("estimated_space_width_pt"),
                            F.col("_nsp").alias("proportional_spaces"),
                        ),
                    )
                ).over(lw)
            ),
        )
        .withColumn("_rn", F.row_number().over(lw.orderBy("_sidx")))
        .filter(F.col("_rn") == 1)
        .select(
            "url",
            "page",
            "line_id",
            F.aggregate(
                "_parts",
                F.lit(""),
                lambda acc, p: F.concat(
                    acc, F.when(p["_sidx"] > 1, F.lit(" ")).otherwise(F.lit("")), p["text"]
                ),
            ).alias("text"),
            F.aggregate(
                "_parts",
                F.lit(""),
                lambda acc, p: F.concat(
                    acc,
                    F.when(p["_sidx"] > 1, F.repeat(F.lit(" "), p["_nsp"])).otherwise(F.lit("")),
                    p["text"],
                ),
            ).alias("text_proportional"),
            F.transform(
                "_info",
                lambda s: F.struct(
                    s["normalized_text_index"].alias("normalized_text_index"),
                    s["raw_gap_pt"].alias("raw_gap_pt"),
                    s["estimated_space_width_pt"].alias("estimated_space_width_pt"),
                    s["proportional_spaces"].alias("proportional_spaces"),
                ),
            ).alias("proportional_spacing_info"),
        )
    )


def assemble_lines(
    words_with_lines: DataFrame,
    segments: DataFrame,
    page_dims: DataFrame,
) -> DataFrame:
    """Assemble the full line records: text (O2), bbox (C5), predominant
    size/font + coverage (A1), gap_before/gap_after (W1/W2).

    ``page_dims``: (url, page, page_width, page_height).
    Output matches FIXTURES.md §4 (flat, one row per line).
    """
    # --- line bbox from words (extractor.py:401-415)
    bbox = words_with_lines.groupBy("url", "page", "line_id").agg(
        F.min("x0").alias("bx0"),
        F.min("top").alias("btop"),
        F.max("x1").alias("bx1"),
        F.max("bottom").alias("bbot"),
    )

    texts = line_texts_from_segments(segments)

    # --- A1 predominant size/font (width-weighted, first-seen tie-break)
    def _predominant(col: str, out: str) -> DataFrame:
        per_key = segments.groupBy("url", "page", "line_id", col).agg(
            F.sum("seg_width").alias("w"), F.min("seg_id").alias("first_seen")
        )
        return per_key.groupBy("url", "page", "line_id").agg(
            F.max_by(col, F.struct(F.col("w"), -F.col("first_seen"))).alias(out),
            F.max(F.struct(F.col("w"), -F.col("first_seen")))["w"].alias(out + "_w"),
            F.sum("w").alias(out + "_total"),
        )

    psize = _predominant("rounded_size", "predominant_size")
    pfont = _predominant("font", "predominant_font")

    lines = (
        bbox.join(texts, ["url", "page", "line_id"], "left")
        .join(psize, ["url", "page", "line_id"], "left")
        .join(pfont, ["url", "page", "line_id"], "left")
        .join(page_dims, ["url", "page"], "left")
        .withColumn("text", F.coalesce("text", F.lit("")))
        .withColumn("text_proportional", F.coalesce("text_proportional", F.lit("")))
        .withColumn(
            "predominant_size_coverage",
            F.when(
                F.col("predominant_size").isNotNull() & (F.col("predominant_size_total") > 0),
                # match Python eval order: round((w/total*100), 1)
                py_round((F.col("predominant_size_w") / F.col("predominant_size_total") * 100) * 10)
                / 10,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "predominant_font_coverage",
            F.when(
                F.col("predominant_font").isNotNull() & (F.col("predominant_font_total") > 0),
                py_round((F.col("predominant_font_w") / F.col("predominant_font_total") * 100) * 10)
                / 10,
            ).otherwise(F.lit(0.0)),
        )
    )

    # --- W1/W2 gaps + line numbering (extractor.py:277-330)
    wp = Window.partitionBy("url", "page").orderBy("line_id")
    lines = (
        lines.withColumn("line_number", F.row_number().over(wp))
        .withColumn(
            "gap_before",
            F.when(F.col("line_number") == 1, F.col("btop")).otherwise(
                F.greatest(F.col("btop") - F.lag("bbot").over(wp), F.lit(0.0))
            ),
        )
        .withColumn(
            "gap_after",
            F.when(
                F.lead("btop").over(wp).isNotNull(),
                F.greatest(F.lead("btop").over(wp) - F.col("bbot"), F.lit(0.0)),
            ).otherwise(F.greatest(F.col("page_height") - F.col("bbot"), F.lit(0.0))),
        )
    )
    return lines.select(
        "url",
        "page",
        "line_id",
        "line_number",
        "text",
        "text_proportional",
        "proportional_spacing_info",
        F.struct(
            F.col("bx0").alias("x0"),
            F.col("btop").alias("top"),
            F.col("bx1").alias("x1"),
            F.col("bbot").alias("bottom"),
        ).alias("bbox"),
        "predominant_size",
        "predominant_font",
        "predominant_size_coverage",
        "predominant_font_coverage",
        "gap_before",
        "gap_after",
        "page_width",
        "page_height",
    )


def drop_blank_lines(lines: DataFrame) -> DataFrame:
    """P1 (extractor.py:500-585): remove blank lines, re-derive both gaps
    from nearest non-blank neighbours, renumber (original kept)."""
    kept = lines.filter(F.regexp_replace("text", r"(?U)^\s+|\s+$", "") != "")
    wp = Window.partitionBy("url", "page").orderBy("line_id")
    return (
        kept.withColumn("original_line_number", F.col("line_number"))
        .withColumn("line_number", F.row_number().over(wp))
        .withColumn(
            "gap_before",
            F.when(F.col("line_number") == 1, F.col("bbox")["top"]).otherwise(
                F.greatest(
                    F.col("bbox")["top"] - F.lag(F.col("bbox")["bottom"]).over(wp),
                    F.lit(0.0),
                )
            ),
        )
        .withColumn(
            "gap_after",
            F.when(
                F.lead(F.col("bbox")["top"]).over(wp).isNotNull(),
                F.greatest(
                    F.lead(F.col("bbox")["top"]).over(wp) - F.col("bbox")["bottom"],
                    F.lit(0.0),
                ),
            ).otherwise(
                F.greatest(F.col("page_height") - F.col("bbox")["bottom"], F.lit(0.0))
            ),
        )
    )
