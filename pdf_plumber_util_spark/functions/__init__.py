from .rounding import (  # noqa: F401
    py_round,
    round_to_nearest,
    round_half,
    round_quarter,
    round_2dp,
)
from .text import normalize_line, py_strip, font_style, font_family  # noqa: F401
