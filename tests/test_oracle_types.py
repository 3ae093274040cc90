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


def test_no_top_level_container_columns_in_any_oracle(con):
    """Top-level LIST/STRUCT/MAP oracle columns die in the driver's pandas
    `sort_values` canonicalization (unhashable cells) — the r9
    `pack_sequences` regression. Leaf-type nesting stays allowed for the
    general type check below (CTE internals may use lists freely); the
    OUTPUT columns may not."""
    bad: dict[str, list[str]] = {}
    for name, sql in ORACLES.items():
        rel = con.sql(sql)
        offenders = [
            f"{col}: {typ}"
            for col, typ in zip(rel.columns, rel.types)
            if str(typ).endswith("[]")
            or str(typ).startswith(("STRUCT(", "MAP(", "UNION("))
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "oracle output columns with container types — the driver cannot "
        "pandas-sort these; string_agg/serialize them (the r1 keyed_merge "
        f"convention): {bad}"
    )


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


# --- r7: the one remaining hash hazard — raw transcendental doubles --------
#
# The HUGEINT rule above guards integer promotion; the float analogue is a
# DOUBLE output column fed by ln/log/exp: libm last-ulp differences between
# the JVM and DuckDB would flip the value hash. Suite discipline: every
# log-derived quantity is floor-quantized to integer micro-nats BEFORE any
# aggregation (text.py unigram xent, tfidf, DSIR), so a DOUBLE column may
# coexist with transcendental SQL only when it is a deterministic ratio of
# PRE-QUANTIZED integers — documented at the query site and allowlisted
# here. A new entry requires that documentation; a stale entry fails too.
DOCUMENTED_TRANSCENDENTAL_DOUBLES = {
    # avg/ratio/quality: single divisions of exact integer counts
    # (suite.py::_text_quality_oracle; ln appears only in the xent leg,
    # whose outputs are the BIGINT xent_*_micro columns)
    "text_quality": {"avg_token_len", "stopword_ratio", "uniq_ratio", "quality"},
    # weight = sqrt_micro/z_micro, both exact longs (q_domain_mixture
    # docstring); ln appears only in the DSIR CTEs, quantized to BIGINT
    # micro-nats before every sum
    "domain_mixture": {"weight"},
}

_TRANSCENDENTAL = re.compile(r"\b(ln|log|log2|log10|exp)\s*\(", re.IGNORECASE)


def test_no_raw_transcendental_double_reaches_an_oracle_output(con):
    bad: dict[str, list[str]] = {}
    stale = dict(DOCUMENTED_TRANSCENDENTAL_DOUBLES)
    for name, sql in ORACLES.items():
        if not _TRANSCENDENTAL.search(sql):
            assert name not in stale, (
                f"{name} is allowlisted but its oracle no longer uses "
                "transcendental math — remove the stale entry"
            )
            continue
        rel = con.sql(sql)
        doubles = {
            col for col, typ in zip(rel.columns, rel.types) if str(typ) == "DOUBLE"
        }
        documented = stale.pop(name, set())
        assert documented <= doubles, (
            f"{name}: allowlisted columns {sorted(documented - doubles)} "
            "no longer exist / are no longer DOUBLE — prune the entry"
        )
        undocumented = doubles - documented
        if undocumented:
            bad[name] = sorted(undocumented)
    assert not bad, (
        "oracle DOUBLE columns in transcendental-math oracles without "
        "query-site documentation — quantize to integer micro-units before "
        "aggregating, or document why the value is a deterministic ratio "
        f"of pre-quantized integers and allowlist: {bad}"
    )
