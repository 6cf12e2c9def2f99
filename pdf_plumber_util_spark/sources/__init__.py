from .render import layout_html, WORD_FIELDS  # noqa: F401
from .pages import synth_pages  # noqa: F401
from .tokenizer import tokenize_pages, WORD_SCHEMA  # noqa: F401
from .tables import load_table, words_from_lineitem, WORDS_FROM_LINEITEM_SQL  # noqa: F401
