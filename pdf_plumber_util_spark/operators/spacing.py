"""Contextual spacing statistics and gap classification.

SURVEY.md §2 operators A4-A9 (rules derivation) and O1 (classifier),
semantics from core/analyzer.py:66-251. All per-document aggregates are
keyed by ``url`` so they stay on the url partitioning; the rules table is
tiny per document and joined back (broadcast-sized in practice, but a
same-key join on (url, size) stays co-partitioned — no broadcast needed
since both sides are url-partitioned).

Mode tie-breaking: the reference uses Counter.most_common(1) whose ties
resolve by insertion (= first-occurrence-in-document) order; we pin this
with max_by(value, struct(count, -first_seen_position)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to_nearest


def _doc_ordered(lines: DataFrame) -> DataFrame:
    """Flatten the document: global position over (page, line_number)
    (the reference extends all pages into one list, analyzer.py:670-676)."""
    w = Window.partitionBy("url").orderBy("page", "line_number")
    return lines.withColumn("_pos", F.row_number().over(w))


def contextual_gaps(lines: DataFrame, gap_rounding: float = 0.5) -> DataFrame:
    """A6 (analyzer.py:66-120): gaps between same-predominant-size adjacent
    lines (document-flattened order), rounded to gap_rounding, gap > 0.01.

    Returns one row per qualifying gap:
      url, context_size, rounded_gap, _pos (document position of the line).
    """
    df = _doc_ordered(lines)
    w = Window.partitionBy("url").orderBy("_pos")
    prev_size = F.lag("predominant_size").over(w)
    return (
        df.withColumn("_prev_size", prev_size)
        .filter(
            F.col("predominant_size").isNotNull()
            & F.col("predominant_size").eqNullSafe(F.col("_prev_size"))
            & F.col("gap_before").isNotNull()
            & (F.col("gap_before") > 0.01)
        )
        .select(
            "url",
            F.col("predominant_size").alias("context_size"),
            round_to_nearest(F.col("gap_before"), gap_rounding).alias("rounded_gap"),
            "_pos",
        )
    )


def context_line_totals(lines: DataFrame) -> DataFrame:
    """Per (url, predominant_size): total line count (analyzer.py:88-93)."""
    return (
        lines.filter(F.col("predominant_size").isNotNull())
        .groupBy("url", F.col("predominant_size").alias("context_size"))
        .agg(F.count("*").alias("total_lines"))
    )


def contextual_spacing_rules(
    lines: DataFrame,
    gap_rounding: float = 0.5,
    lo_mult: float = 0.8,
    hi_mult: float = 1.2,
    para_mult: float = 1.1,
) -> DataFrame:
    """A7 (analyzer.py:122-210): per (url, context_size) spacing rules.

    Returns: url, context_size, most_common_gap, range_lo, range_hi,
    para_spacing_max, total_gaps, total_lines, first_ctx_pos (for the O1
    fallback tie-break = insertion order of the context).
    """
    gaps = contextual_gaps(lines, gap_rounding)
    per_gap = gaps.groupBy("url", "context_size", "rounded_gap").agg(
        F.count("*").alias("cnt"), F.min("_pos").alias("first_seen")
    )
    rules = per_gap.groupBy("url", "context_size").agg(
        F.max_by("rounded_gap", F.struct(F.col("cnt"), -F.col("first_seen"))).alias(
            "most_common_gap"
        ),
        F.sum("cnt").alias("total_gaps"),
        F.min("first_seen").alias("first_ctx_pos"),
    )
    rules = (
        rules.withColumn("range_lo", F.col("most_common_gap") * lo_mult)
        .withColumn("range_hi", F.col("most_common_gap") * hi_mult)
        .withColumn("para_spacing_max", F.col("context_size") * para_mult)
    )
    return rules.join(context_line_totals(lines), ["url", "context_size"], "left")


def fallback_context(rules: DataFrame) -> DataFrame:
    """O1 fallback (analyzer.py:232-243): per url, the context with the most
    total_gaps; ties resolve to the earliest-inserted context."""
    return rules.groupBy("url").agg(
        F.max_by(
            F.struct("context_size", "range_hi", "para_spacing_max"),
            F.struct(F.col("total_gaps"), -F.col("first_ctx_pos")),
        ).alias("_fb")
    ).select(
        "url",
        F.col("_fb")["context_size"].alias("fb_context_size"),
        F.col("_fb")["range_hi"].alias("fb_range_hi"),
        F.col("_fb")["para_spacing_max"].alias("fb_para_max"),
    )


def classify_gaps(
    df: DataFrame,
    rules: DataFrame,
    gap_col: str = "gap_before",
    size_col: str = "predominant_size",
    out_col: str = "gap_type",
    gap_rounding: float = 0.5,
) -> DataFrame:
    """O1 (analyzer.py:212-251): classify ``gap_col`` per row using the
    (url, size) rules, falling back to the url's dominant context, default
    'Line'. Adds ``out_col``.
    """
    r = rules.select(
        "url",
        F.col("context_size").alias(size_col),
        F.col("range_hi").alias("_r_hi"),
        F.col("para_spacing_max").alias("_r_pmax"),
    )
    fb = fallback_context(rules)
    joined = df.join(r, ["url", size_col], "left").join(fb, ["url"], "left")
    hi = F.coalesce("_r_hi", "fb_range_hi")
    pmax = F.coalesce("_r_pmax", "fb_para_max")
    rg = round_to_nearest(F.col(gap_col), gap_rounding)
    cls = (
        F.when(hi.isNull(), F.lit("Line"))
        .when(rg <= hi, F.lit("Line"))
        .when(rg <= pmax, F.lit("Paragraph"))
        .otherwise(F.lit("Section"))
    )
    return joined.withColumn(out_col, cls).drop("_r_hi", "_r_pmax", "fb_context_size", "fb_range_hi", "fb_para_max")


def line_spacing_summary(lines: DataFrame, step: float = 0.5) -> DataFrame:
    """A4/A5 (analyzer.py:331-382): doc-level most common positive rounded
    spacing + potential-paragraph-gap window counts.

    Returns per url: most_common_spacing, its count, total_spacings,
    para_gap_lo/hi bounds.
    """
    sp = (
        _doc_ordered(lines)
        .filter(F.col("gap_before").isNotNull() & (F.col("gap_before") > 0))
        .select("url", round_to_nearest(F.col("gap_before"), step).alias("sp"), "_pos")
    )
    per = sp.groupBy("url", "sp").agg(F.count("*").alias("cnt"), F.min("_pos").alias("fs"))
    nz = per.filter(F.col("sp") > 0.01).groupBy("url").agg(
        F.max_by("sp", F.struct("cnt", -F.col("fs"))).alias("mc_nz"),
        F.max(F.struct("cnt", -F.col("fs")))["cnt"].alias("mc_nz_cnt"),
    )
    anymode = per.groupBy("url").agg(
        F.max_by("sp", F.struct("cnt", -F.col("fs"))).alias("mc_any"),
        F.max(F.struct("cnt", -F.col("fs")))["cnt"].alias("mc_any_cnt"),
        F.sum("cnt").alias("total_spacings"),
    )
    return (
        anymode.join(nz, "url", "left")
        .select(
            "url",
            F.coalesce("mc_nz", "mc_any").alias("most_common_spacing"),
            F.coalesce("mc_nz_cnt", "mc_any_cnt").alias("most_common_spacing_count"),
            "total_spacings",
        )
    )
