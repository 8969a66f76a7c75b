from .pages import generate_corpus, write_pages, read_pages
from .tables import load_table, TESTDATA_TABLES

__all__ = [
    "generate_corpus",
    "write_pages",
    "read_pages",
    "load_table",
    "TESTDATA_TABLES",
]
