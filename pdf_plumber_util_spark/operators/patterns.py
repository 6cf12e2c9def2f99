"""Regex pattern registry + full-document scan (R1-R4).

The reference registers 32 named regexes in 6 types (pattern_manager.py:
70-302) and scans every non-blank line against all of them
(document_scanner.py:48-220). Spark shape: the registry is a tiny literal
broadcast; the scan is one pass with regexp_extract_all per pattern (a
lines x patterns cross join would shuffle the big side — a generated
column per pattern keeps it map-only), then posexplode of matches.

Patterns are written in the RE2-compatible subset so the DuckDB oracle
runs them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# name -> (type, regex); RE2-safe subset of the reference registry
# (pattern_manager.py:72-271)
PATTERN_REGISTRY: dict[str, tuple[str, str]] = {
    "decimal_simple": ("section", r"\b\d+\.\d+ [A-Z][a-z]+"),
    "decimal_deep": ("section", r"\b\d+\.\d+\.\d+(\.\d+)*"),
    "decimal_no_space_numeric": ("section", r"\b\d+(\.\d+)+[A-Z][a-z]+"),
    "annex": ("section", r"\bAnnex [A-Z]\b"),
    "chapter": ("section", r"\bChapter \d+"),
    "letter_section": ("section", r"\b[A-Z]\.\d+(\.\d+)*"),
    "roman_parentheses": ("section", r"\((i{1,3}|iv|v|vi{0,3}|ix|x)\)"),
    "figure_caption": ("figure", r"\bFigure \d+(-\d+)?"),
    "table_caption": ("table", r"\bTable \d+(-\d+)?"),
    "toc_entry": ("toc_entry", r"\.\.\.+ ?\d+$"),
    "page_number_formatted": ("page_number", r"\bPage \d+ of \d+"),
    "page_number_bare": ("page_number", r"^\d+$"),
}

PATTERN_SETS: dict[str, list[str]] = {
    "headings": ["decimal_simple", "decimal_deep", "decimal_no_space_numeric",
                 "annex", "chapter", "letter_section"],
    "captions": ["figure_caption", "table_caption"],
    "furniture": ["page_number_formatted", "page_number_bare"],
    "toc": ["toc_entry"],
}


def pattern_registry_df(spark) -> DataFrame:
    rows = [(n, t, rx) for n, (t, rx) in PATTERN_REGISTRY.items()]
    return spark.createDataFrame(rows, "pattern_name string, pattern_type string, regex string")


def scan_patterns(
    lines: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("url", "page", "line_number"),
    registry: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """R2: one row per (line, pattern, match). Map-only (no shuffle):
    each pattern becomes a generated matches column, then a single stack
    + explode."""
    reg = registry or PATTERN_REGISTRY
    nonblank = lines.filter(F.regexp_replace(text_col, r"(?U)^\s+|\s+$", "") != "")
    match_arrays = F.array(*[
        F.struct(
            F.lit(name).alias("pattern_name"),
            F.lit(ptype).alias("pattern_type"),
            F.regexp_extract_all(F.col(text_col), F.lit(rx), 0).alias("matches"),
        )
        for name, (ptype, rx) in reg.items()
    ])
    exploded = nonblank.select(
        *id_cols, F.col(text_col).alias("line_text"),
        F.explode(match_arrays).alias("p"),
    ).select(
        *id_cols, "line_text",
        F.col("p.pattern_name").alias("pattern_name"),
        F.col("p.pattern_type").alias("pattern_type"),
        F.explode("p.matches").alias("match"),
    )
    return exploded


def scan_statistics(matches: DataFrame, page_col: str = "page") -> DataFrame:
    """A16 (document_scanner.py:402-426): per pattern totals and page
    coverage."""
    return matches.groupBy("pattern_name", "pattern_type").agg(
        F.count("*").cast("long").alias("total_matches"),
        F.countDistinct(page_col).cast("long").alias("pages_with_matches"),
    )


def group_matches_for_review(matches: DataFrame) -> DataFrame:
    """R4 (document_scanner.py:443-493): matches grouped per pattern type
    with collected examples (sorted for determinism)."""
    return matches.groupBy("pattern_type", "pattern_name").agg(
        F.count("*").cast("long").alias("n"),
        F.array_sort(F.collect_set("match")).alias("examples"),
    )
