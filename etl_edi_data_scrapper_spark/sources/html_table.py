"""Minimal HTML-table reader for the spreadsheet dispatch.

Parity target: PhpSpreadsheet's auto-detecting ``IOFactory::load``
(`src/Service/InputHandler/ExcelInputHandler.php:108-116`) includes an Html
reader, so an HTML table export — the "download as spreadsheet" a supplier
portal actually produces — loads through the reference's Excel pipeline.

Stdlib ``html.parser`` (real-world HTML is not XML — unclosed ``td``/``tr``
must parse): the FIRST ``<table>`` becomes the grid, ``tr`` rows, ``td``/
``th`` cells, text concatenated per cell with entities decoded. All values
surface as strings (the engine-wide all-strings contract); header/padding/
range handling is shared with the XLSX/BIFF8/ODS paths via
``files._grid_to_table``.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _FirstTableParser(HTMLParser):
    """Collect rows of the first top-level <table>. A table nested inside a
    cell is skipped entirely — its markup neither contributes text to the
    outer cell nor disturbs the outer row structure (text AROUND the nested
    table still belongs to the outer cell)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rows: list[list[str]] = []
        self._table_depth = 0
        self._done = False
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._done:
            return
        if tag == "table":
            self._table_depth += 1
            return
        if self._table_depth != 1:
            return  # outside any table, or inside a nested one
        if tag == "tr":
            self._flush_row()
            self._row = []
        elif tag in ("td", "th"):
            self._flush_cell()
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if self._done:
            return
        if tag == "table" and self._table_depth:
            self._table_depth -= 1
            if self._table_depth == 0:
                self._flush_row()
                self._done = True
            return
        if self._table_depth != 1:
            return
        if tag == "tr":
            self._flush_row()
        elif tag in ("td", "th"):
            self._flush_cell()

    def handle_data(self, data: str) -> None:
        if self._cell is not None and self._table_depth == 1 and not self._done:
            self._cell.append(data)

    def _flush_cell(self) -> None:
        if self._row is not None and self._cell is not None:
            self._row.append("".join(self._cell).strip())
        self._cell = None

    def _flush_row(self) -> None:
        self._flush_cell()
        if self._row:
            self.rows.append(self._row)
        self._row = None


def looks_like_html_table(head: bytes) -> bool:
    """Cheap sniff on the first few KB: an HTML document with a table."""
    lowered = head.lower()
    return b"<table" in lowered and (
        lowered.lstrip()[:1] == b"<" or b"<html" in lowered or b"<!doctype" in lowered
    )


def read_html_grid(path: str) -> dict[int, dict[int, str]]:
    """HTML file → {row: {col: text}} from its first table (empty cells
    skipped, matching the other spreadsheet grid contracts)."""
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        parser = _FirstTableParser()
        parser.feed(fh.read())
        parser.close()
    grid: dict[int, dict[int, str]] = {}
    for r, row in enumerate(parser.rows):
        for c, v in enumerate(row):
            if v != "":
                grid.setdefault(r, {})[c] = v
    return grid
