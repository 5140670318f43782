"""Sources: page tables (Common-Crawl-shaped parquet) and OBO frames."""

from .obo_source import read_obo_frames, read_obo_header, split_obo
from .pages import documents_as_pages, read_pages

__all__ = ["read_pages", "documents_as_pages", "read_obo_frames",
           "read_obo_header", "split_obo"]
