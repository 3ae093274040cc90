"""Local replica of the driver's correctness gate.

Runs every __spark_entry__ query at sf0.01 on Spark AND its DuckDB oracle,
compares row count + column names + an order-insensitive value hash
(floats compared by exact bits — stricter than the driver needs).

Usage: python tools/verify_local.py [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def driver_canon_check(rows: list[tuple], cols: list[str]) -> None:
    """Replicate the driver's canonicalization step EXACTLY: a pandas
    DataFrame `sort_values` over every output column. Anything the driver
    cannot sort — list/dict/array cells are unhashable in pandas'
    factorize — must raise HERE, in the local gate, not in the round's
    CORRECTNESS_r{N}.json (the r9 pack_sequences break shipped because the
    old replica canonicalized list→tuple, which the driver never does)."""
    df = pd.DataFrame(rows, columns=list(cols))
    if len(df.columns):
        df.sort_values(by=list(cols), kind="mergesort")


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    driver_canon_check(rows, cols)
    lines = sorted("\x1f".join(canon(c) for c in r) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from etl_edi_data_scrapper_spark import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        status = {}
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
            status["spark_rows"] = len(srows)
        except Exception as e:
            results[name] = {"error": f"spark: {type(e).__name__}: {e}"}
            continue
        if name not in oracles:
            status["oracle"] = "none (rows-only)"
            results[name] = status
            continue
        try:
            rel = con.sql(oracles[name])
            ocols_raw = rel.columns
            ocols = sorted(ocols_raw)
            idx = [ocols_raw.index(c) for c in ocols]
            orows = [tuple(r[i] for i in idx) for r in rel.fetchall()]
        except Exception as e:
            results[name] = {"error": f"duckdb: {type(e).__name__}: {e}"}
            continue
        status["oracle_rows"] = len(orows)
        status["cols_match"] = scols == ocols
        if scols != ocols:
            status["spark_cols"] = scols
            status["oracle_cols"] = ocols
        try:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
        except TypeError as e:
            # the driver's pandas sort raises on container cells — fail
            # the same way it does instead of canonicalizing around it
            results[name] = {"error": f"canon: TypeError: {e}"}
            continue
        status["hash_match"] = sh == oh
        if sh != oh and len(srows) == len(orows) and scols == ocols:
            sset = {tuple(canon(c) for c in r) for r in srows}
            oset = {tuple(canon(c) for c in r) for r in orows}
            status["sample_spark_only"] = list(sset - oset)[:3]
            status["sample_oracle_only"] = list(oset - sset)[:3]
        results[name] = status

    ok = True
    for name, st in results.items():
        good = st.get("hash_match") and st.get("cols_match") and (
            st.get("spark_rows") == st.get("oracle_rows")
        )
        if st.get("oracle") == "none (rows-only)":
            good = st.get("spark_rows", 0) >= 0
        flag = "PASS" if good else "FAIL"
        if not good:
            ok = False
        print(f"{flag} {name}: {json.dumps(st, default=str)[:2000]}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
