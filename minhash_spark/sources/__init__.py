from .pages import generate_corpus, write_pages, read_pages
from .tables import load_table, TESTDATA_TABLES
from .warc import read_warc, parse_warc, build_warc, html_to_text

__all__ = [
    "generate_corpus",
    "write_pages",
    "read_pages",
    "load_table",
    "TESTDATA_TABLES",
    "read_warc",
    "parse_warc",
    "build_warc",
    "html_to_text",
]
