"""Oracle type hygiene: every oracle's DuckDB output schema must contain
only types the driver's canonicalization round-trips losslessly.

The driver compares Spark and oracle results through a pandas path; DuckDB
types outside pandas' native dtypes get converted lossily and hash-mismatch
against Spark even when the values are identical. The one observed failure
mode (round 5, `pack_sequences`): `sum(BIGINT)` — window or aggregate —
promotes to HUGEINT (int128), which pandas renders as float64, so Spark's
`318` hashes against `318.0`. Integer `//` on promoted operands inherits
the promotion. The suite convention is to `CAST(... AS BIGINT)` every
integer aggregate/window/arithmetic output; this test enforces it by
BINDING (not executing) each oracle against the sf0.001 parquet and
checking every output column type, including inside LIST/STRUCT nesting.

FLOAT (float32) is also forbidden: Spark float32 → Python float round-trips
differently from DuckDB float32 → pandas, and the suite uses DOUBLE
everywhere.
"""

import re

import duckdb
import pytest

from etl_edi_data_scrapper_spark.suite import ORACLES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types that survive the driver's pandas canonicalization bit-exactly.
ALLOWED = {
    "BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
    "INTEGER", "BLOB",
}
_DECIMAL = re.compile(r"^DECIMAL\(\d+,\d+\)$")


def _leaf_types(t: str) -> list[str]:
    """Flatten a DuckDB type string into its leaf scalar type names.

    LIST types render as `T[]`; STRUCT as `STRUCT(a T, b U)`; MAP as
    `MAP(K, V)`. We strip list suffixes and pull scalar tokens out of
    composite types so a HUGEINT hiding inside `HUGEINT[]` still fails.
    """
    t = t.strip()
    while t.endswith("[]"):
        t = t[:-2]
    if t.startswith(("STRUCT(", "MAP(", "UNION(")):
        inner = t[t.index("(") + 1 : -1]
        # scalar type tokens are uppercase words possibly with (p,s)
        toks = re.findall(r"\b[A-Z]+(?:\(\d+(?:,\d+)?\))?(?:\[\])*", inner)
        out: list[str] = []
        for tok in toks:
            out.extend(_leaf_types(tok))
        return out
    return [t]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield c
    c.close()


def test_every_oracle_binds_and_emits_only_canonical_types(con):
    bad: dict[str, list[str]] = {}
    for name, sql in ORACLES.items():
        rel = con.sql(sql)  # binds (raises on analysis errors); no execution
        offenders = []
        for col, typ in zip(rel.columns, rel.types):
            for leaf in _leaf_types(str(typ)):
                if leaf in ALLOWED or _DECIMAL.match(leaf):
                    continue
                offenders.append(f"{col}: {typ}")
                break
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "oracle columns with driver-lossy DuckDB types "
        "(HUGEINT/FLOAT/...): wrap in CAST(... AS BIGINT/DOUBLE): "
        f"{bad}"
    )
