"""String scalar functions (reference O3, O5) as JVM-side expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python str.strip()/\s semantics cover unicode whitespace, not just ASCII
# space. Java regex \s is ASCII-only by default; enable UNICODE_CHARACTER_CLASS
# via the embedded flag (?U) so `re.sub(r'\s+', ' ', s)` semantics carry over.
_WS = r"(?U)\s+"


def normalize_line(col: Column) -> Column:
    """`re.sub(r'\\s+', ' ', s).strip()` (utils/helpers.py:16-18)."""
    return F.regexp_replace(F.regexp_replace(col, _WS, " "), r"^ +| +$", "")


def py_strip(col: Column) -> Column:
    """Python str.strip(): remove leading/trailing unicode whitespace."""
    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")


def font_style(font: Column) -> Column:
    """Substring tests on fontname -> style (document_scanner.py:303-336)."""
    has_bold = font.contains("Bold")
    has_italic = font.contains("Italic") | font.contains("Oblique")
    return (
        F.when(has_bold & has_italic, F.lit("Bold+Italic"))
        .when(has_bold, F.lit("Bold"))
        .when(has_italic, F.lit("Italic"))
        .otherwise(F.lit("Regular"))
    )


def font_family(font: Column) -> Column:
    """Family = prefix before '-' (document_scanner.py:303-336)."""
    return F.split(font, "-")[0]
