"""Oracle parity for the simhash max_block truncation guard WHEN IT BINDS.

The sf0.01 gate corpus never fills a block past 256, so the driver's
hash-check exercises the guard-on oracle only in its no-op regime. This
test builds a deliberately hot-blocked corpus (many docs sharing signature
pieces) and asserts the engine with ``max_block`` small enough to bind
matches the DuckDB oracle with the same cap — proving the rank-window
re-derivation equals `_block_pairs`' sorted-struct slice bit-for-bit.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from etl_edi_data_scrapper_spark.functions.dedup import simhash_pairs_multi
from etl_edi_data_scrapper_spark.suite import (
    _simhash64_pairs_oracle,
    _simhash_pairs_oracle,
)

# near-identical template texts: whole families land in the same piece
# blocks, so a max_block of 4 truncates aggressively
_DOCS = [
    (i, f"the quick brown fox jumps over the lazy dog variant {i % 6} again")
    for i in range(40)
] + [
    (100 + i, f"completely different payload stream id {i} with unique tail {i * 7}")
    for i in range(10)
]


def _oracle_rows(max_block):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    sql = f"""
    SELECT a, b, hamming, 48 AS sig_bits
    FROM ({_simhash_pairs_oracle(bits=48, max_hamming=3, max_block=max_block)})
    UNION ALL
    SELECT a, b, hamming, 64 AS sig_bits
    FROM ({_simhash64_pairs_oracle(max_hamming=3, max_block=max_block)})
    """
    return sorted(map(tuple, con.sql(sql).fetchall()))


def _engine_rows(spark, max_block):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    return sorted(
        tuple(r)
        for r in simhash_pairs_multi(
            df, single_bits=48, max_hamming=3, max_block=max_block
        ).collect()
    )


def test_simhash_guard_binding_matches_oracle(spark):
    unguarded = _engine_rows(spark, None)
    guarded = _engine_rows(spark, 4)
    # the cap must actually bind on this corpus, and never invent pairs
    assert len(guarded) < len(unguarded)
    assert set(guarded) <= set(unguarded)
    assert guarded == _oracle_rows(4)


def test_simhash_guard_nonbinding_is_identity(spark):
    assert _engine_rows(spark, 10_000) == _engine_rows(spark, None)
    assert _oracle_rows(10_000) == _oracle_rows(None)
