"""Pure text transforms (no Spark imports).

These functions define the engine's correctness contract: the Spark
operators in ``..operators`` call them inside Arrow-batched pandas UDFs,
and the test suite calls them directly as the per-document oracle.
Behavioral parity targets are cited per function as reference file:line
(reference repo: arXiv/zzzArchived_arxiv-fulltext, read-only checkout).
"""

from .unicode_fix import fix_unicode
from .quality import average_word_length, strip_layout_junk, MAX_AVG_WORD_LENGTH
from .tidy import tidy_lines
from .psv import normalize_text_psv, process_text, split_on_references
from .extract import extract_document
from .pdf_text import extract_pdf_text, extract_pdf_page_texts, make_simple_pdf
from .html_extract import extract_main_text, link_density

__all__ = [
    "fix_unicode",
    "average_word_length",
    "strip_layout_junk",
    "MAX_AVG_WORD_LENGTH",
    "tidy_lines",
    "normalize_text_psv",
    "process_text",
    "split_on_references",
    "extract_document",
    "extract_pdf_text",
    "extract_pdf_page_texts",
    "make_simple_pdf",
    "extract_main_text",
    "link_density",
]
