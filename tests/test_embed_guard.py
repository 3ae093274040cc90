"""Oracle parity for embedding_near_pairs' max_block truncation guard —
the embedding analogue of tests/test_minhash_oracle_guard.py. The gate
corpus never fills a label block past 256 (59 at sf0.01 / 218 at sf0.1),
so the driver exercises the guard-on oracle only in its no-op regime;
this test builds a hot-block corpus (one label whose members are all
near-identical vectors — the shape the 100× duplication-density
rotation produces) and pins engine == DuckDB with a cap small enough to
bind, plus the non-binding identity."""

from __future__ import annotations

import duckdb
import pandas as pd

from etl_edi_data_scrapper_spark.functions.dedup import embedding_near_pairs
from etl_edi_data_scrapper_spark.suite import _embed_neardup_oracle

# one 20-member near-identical family under label 1 (tiny one-coordinate
# perturbations, cosine ~1) + a 4-member diverse family under label 2
_VECS = [
    (i, 1, [1.0, 0.5 + 0.001 * i, 0.25, 0.125]) for i in range(20)
] + [
    (100, 2, [1.0, 0.0, 0.0, 0.0]),
    (101, 2, [0.9, 0.1, 0.0, 0.0]),
    (102, 2, [0.0, 1.0, 0.0, 0.0]),
    (103, 2, [0.0, 0.0, 1.0, 0.5]),
]


def _oracle_pairs(max_block):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(_VECS, columns=["vec_id", "label", "embedding"]),
    )
    sql = f"SELECT a, b FROM ({_embed_neardup_oracle(max_block=max_block)}) t"
    return sorted(map(tuple, con.sql(sql).fetchall()))


def _engine_pairs(spark, max_block):
    df = spark.createDataFrame(
        _VECS, "vec_id long, label long, embedding array<float>"
    )
    pairs = embedding_near_pairs(
        df, block_col="label", threshold=0.3, max_block=max_block
    )
    return sorted((r.a, r.b) for r in pairs.collect())


def test_embed_guard_binding_matches_oracle(spark):
    unguarded = _engine_pairs(spark, None)
    guarded = _engine_pairs(spark, 5)
    assert len(guarded) < len(unguarded)  # the cap must actually bind
    assert set(guarded) <= set(unguarded)
    # truncation keeps the smallest ids: the 5-member head of the family
    assert (0, 1) in guarded and (18, 19) not in guarded
    assert guarded == _oracle_pairs(5)


def test_embed_guard_nonbinding_is_identity(spark):
    assert _engine_pairs(spark, 10_000) == _engine_pairs(spark, None)
    assert _oracle_pairs(10_000) == _oracle_pairs(None)
    # the registered bound (256) is non-binding on this corpus too
    assert _engine_pairs(spark, 256) == _engine_pairs(spark, None)
