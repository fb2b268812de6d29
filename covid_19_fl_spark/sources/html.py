"""HTML-table source (SURVEY §2.1 S1) — the Selenium scrape re-expressed.

The reference drives a headless browser to a dashboard, XPath-locates a
``<table>``, and iterates ``<tr>``/``<td>`` skipping 2 header rows
(cv.py:50-69). The engine splits that into:

- a driver-side FETCH+PARSE step (HTML is a point lookup of one small
  page — there is nothing to distribute; browser automation stays
  outside the engine, exactly like SMTP in SURVEY §2.2 K6), and
- ``spark.createDataFrame`` against a declared schema, after which the
  rows participate in distributed plans like any other source.

Parsing uses only the stdlib ``html.parser`` (no lxml/bs4 in the
container); tests feed recorded HTML fixtures, never a live site.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class _TableExtractor(HTMLParser):
    """Collect cell text of every <table> in document order."""

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._in_table = 0
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._in_table += 1
            if self._in_table == 1:
                self.tables.append([])
        elif self._in_table and tag == "tr":
            self._row = []
        elif self._in_table and tag in ("td", "th"):
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "table" and self._in_table:
            self._in_table -= 1
        elif self._in_table and tag == "tr" and self._row is not None:
            self.tables[-1].append(self._row)
            self._row = None
        elif self._in_table and tag in ("td", "th") and self._cell is not None:
            assert self._row is not None
            self._row.append("".join(self._cell).strip())
            self._cell = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)


def parse_html_tables(html: str) -> list[list[list[str]]]:
    """All tables in the document as row-lists of cell strings."""
    p = _TableExtractor()
    p.feed(html)
    return p.tables


def read_html_table(
    spark: SparkSession,
    html: str,
    schema: T.StructType | str,
    table_index: int = 0,
    skip_rows: int = 2,
) -> DataFrame:
    """One ``<table>`` → DataFrame with declared schema.

    ``skip_rows`` defaults to 2 — the reference's double header row
    (``row_num >= 2``, cv.py:58). All cells arrive as strings; the
    canonicalizing casts (P1/P6 etc.) are ingest.normalize_* functions,
    exactly as for the CSV path.
    """
    tables = parse_html_tables(html)
    if table_index >= len(tables):
        raise ValueError(f"document has {len(tables)} table(s), wanted index {table_index}")
    rows = [tuple(r) for r in tables[table_index][skip_rows:] if r]
    return spark.createDataFrame(rows, schema)
