"""Minimal SYLK (``.slk``) reader — the last text format in PhpSpreadsheet's
auto-detect matrix (`ExcelInputHandler.php:108-116` loads via IOFactory,
which includes an Slk reader; Excel still offers "SYLK" in Save-As).

Format essentials: semicolon-separated records per line; ``C`` records carry
cells — ``Y``/``X`` set the (1-based, sticky) row/column, ``K`` the value.
Quoted K values are strings (``;;`` escapes a literal semicolon); bare ones
are numbers, displayed through the shared ``_fmt_num`` rule. All values
surface as strings (engine-wide contract).
"""

from __future__ import annotations

from etl_edi_data_scrapper_spark.sources.biff import _fmt_num


def looks_like_sylk(head: bytes) -> bool:
    return head[:3] == b"ID;"


def _split_fields(line: str) -> list[str]:
    """Split on ';' honoring the ';;' escape inside quoted K values."""
    fields: list[str] = []
    cur: list[str] = []
    i, n = 0, len(line)
    while i < n:
        ch = line[i]
        if ch == ";":
            if i + 1 < n and line[i + 1] == ";":
                cur.append(";")
                i += 2
                continue
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    fields.append("".join(cur))
    return fields


def read_sylk_grid(path: str) -> dict[int, dict[int, str]]:
    """.slk file → {row: {col: text}} (0-based)."""
    grid: dict[int, dict[int, str]] = {}
    y = x = 1
    with open(path, "r", encoding="latin-1", newline="") as fh:
        for line in fh:
            line = line.rstrip("\r\n")
            if not line.startswith("C;"):
                continue
            val: str | None = None
            for field in _split_fields(line)[1:]:
                if not field:
                    continue
                tag, rest = field[0], field[1:]
                if tag == "Y" and rest.isdigit():
                    y = int(rest)
                elif tag == "X" and rest.isdigit():
                    x = int(rest)
                elif tag == "K":
                    if rest.startswith('"') and rest.endswith('"') and len(rest) >= 2:
                        val = rest[1:-1]
                    else:
                        try:
                            # OverflowError: 1e999 parses to inf, which
                            # _fmt_num's int() rejects — keep literal text
                            val = _fmt_num(float(rest))
                        except (ValueError, OverflowError):
                            val = rest
            if val is not None:
                grid.setdefault(y - 1, {})[x - 1] = val
    return grid


def write_minimal_sylk(path: str, rows: list[list[str | float | None]]) -> None:
    """Fixture generator (tests only): ID header, C records, E terminator."""
    lines = ["ID;PSPARK"]
    for r, row in enumerate(rows, start=1):
        for c, v in enumerate(row, start=1):
            if v is None:
                continue
            if isinstance(v, str):
                k = '"' + v.replace(";", ";;") + '"'
            else:
                k = repr(float(v))
            lines.append(f"C;Y{r};X{c};K{k}")
    lines.append("E")
    with open(path, "w", encoding="latin-1", newline="") as fh:
        fh.write("\r\n".join(lines) + "\r\n")
