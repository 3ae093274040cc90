"""File-format readers (the reference's parser half of transport ⊗ parser).

Reference parsers: CSV (`src/Service/InputHandler/CsvInputHandler.php:65-95`),
Excel (`ExcelInputHandler.php:27-242`), Morris XML
(`MorrisXmlSftpInputHandler.php:21-62`), REST JSON pages
(`RestApiInputHandler.php:46-119`). All produce header-named string columns
except Morris XML (typed: gtin string, qty long, price double) and REST
(native JSON types).

Spark-first: CSV/JSON/Parquet go through ``spark.read`` (distributed,
pushdown-capable). Excel and Morris XML are driver-side parses to a staging
DataFrame — correct at feed scale (supplier files are small dimension
inputs); the 100 TB path is the spark-xml / spark-excel DataSourceV2
packages, noted inline.
"""

from __future__ import annotations

import glob
import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, source: str, range_: str | None = None) -> DataFrame:
    return spark.read.parquet(source)


def read_csv(spark: SparkSession, source: str, range_: str | None = None) -> DataFrame:
    """Header row = schema (all strings); malformed rows dropped.

    DROPMALFORMED reproduces the reference's "skip rows whose column count ≠
    header count" (`CsvInputHandler.php:80-83`); blank lines are skipped by
    the CSV parser already. No inferSchema: the reference yields strings and
    cleaning happens by target name in the mapper.
    """
    return (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(source)
    )


def read_json(spark: SparkSession, source: str, range_: str | None = None) -> DataFrame:
    return spark.read.json(source)


MORRIS_SCHEMA = T.StructType(
    [
        T.StructField("gtin", T.StringType(), True),
        T.StructField("qty", T.LongType(), True),
        T.StructField("price", T.DoubleType(), True),
    ]
)


def read_morris_xml(spark: SparkSession, source: str, range_: str | None = None) -> DataFrame:
    """Morris feed: one row per ``<available>`` element; unions all files.

    Per-field casts match `MorrisXmlSftpInputHandler.php:32-36`:
    gtin → string, qty → int, detail/price → float. Multi-file union =
    `:54-59`. Driver-side ElementTree parse (feeds are small); at scale use
    spark-xml (``rowTag="available"``) for a distributed scan.
    """
    paths = sorted(glob.glob(source)) if any(ch in source for ch in "*?[") else [source]
    rows: list[tuple[str | None, int | None, float | None]] = []
    for path in paths:
        root = ET.parse(path).getroot()
        for el in root.iter("available"):
            gtin = el.findtext("gtin")
            qty = el.findtext("qty")
            price = el.findtext("detail/price")
            rows.append(
                (
                    str(gtin) if gtin is not None else None,
                    int(qty) if qty not in (None, "") else None,
                    float(price) if price not in (None, "") else None,
                )
            )
    return spark.createDataFrame(rows, MORRIS_SCHEMA)


# --- Excel ------------------------------------------------------------------

_RANGE_RE = re.compile(r"^(?:(?P<sheet>[^!]+)!)?(?P<start>[A-Z]+[0-9]*)(?::(?P<end>[A-Z]+[0-9]*))?$")


def normalize_excel_range(range_: str, max_row: int) -> tuple[str | None, str]:
    """Reproduce `ExcelInputHandler.php:126-139, :203-240` range dialect.

    ``"Sheet!A1:D"`` → (Sheet, ``A1:D{max_row}``); ``"A:I"`` → ``A1:I{max_row}``;
    open-ended ends get the sheet's max row appended.
    """
    m = _RANGE_RE.match(range_.strip())
    if not m:
        raise ValueError(f"unparseable excel range: {range_!r}")
    sheet = m.group("sheet")
    start, end = m.group("start"), m.group("end")
    if not re.search(r"[0-9]", start):
        start = f"{start}1"
    if end is None:
        end = start
    if not re.search(r"[0-9]", end):
        end = f"{end}{max_row}"
    return sheet, f"{start}:{end}"


def read_excel(spark: SparkSession, source: str, range_: str | None = None) -> DataFrame:
    """Excel scan; unions all matched files (`ExcelInputHandler.php:38-50`).

    First row = header, short rows padded with null (:168-172). Requires
    ``openpyxl`` (not in this container) — gated; the 100 TB path is the
    spark-excel DataSourceV2 package.
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Excel reads need openpyxl (or the spark-excel package on a real "
            "cluster); not available in this environment"
        ) from e
    import pandas as pd

    paths = sorted(glob.glob(source)) if any(ch in source for ch in "*?[") else [source]
    frames = []
    for path in paths:
        sheet, _cells = (None, None)
        if range_:
            sheet, _cells = normalize_excel_range(range_, max_row=2**20)
        pdf = pd.read_excel(path, sheet_name=sheet or 0, dtype=str)
        frames.append(spark.createDataFrame(pdf))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def pad_and_trim_header_rows(df: DataFrame) -> DataFrame:
    """Sheets/Excel cell hygiene: trim strings (header trimmed at read)."""
    return df.select(*[F.trim(F.col(c)).alias(c.strip()) for c in df.columns])
