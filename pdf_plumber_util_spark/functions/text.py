"""String scalar functions (reference O3, O5) as JVM-side expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python str.strip()/\s semantics cover unicode whitespace, not just ASCII
# space. Java regex \s is ASCII-only by default; (?U) enables
# UNICODE_CHARACTER_CLASS (\s = Unicode White_Space), but Python's \s /
# str.isspace() ADDITIONALLY includes the information-separator controls
# U+001C-U+001F (bidi class B/S), which White_Space excludes — found by
# the hypothesis property test against CPython. The explicit class closes
# the gap exactly.
WS_CLASS = r"[\s\x1c-\x1f]"
_WS = r"(?U)" + WS_CLASS + "+"
# leading/trailing run of Python-whitespace (str.strip() analog)
STRIP_RE = r"(?U)^" + WS_CLASS + "+|" + WS_CLASS + "+$"


def normalize_line(col: Column) -> Column:
    """`re.sub(r'\\s+', ' ', s).strip()` (utils/helpers.py:16-18)."""
    return F.regexp_replace(F.regexp_replace(col, _WS, " "), r"^ +| +$", "")


def py_strip(col: Column) -> Column:
    """Python str.strip(): remove leading/trailing unicode whitespace."""
    return F.regexp_replace(col, STRIP_RE, "")


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
