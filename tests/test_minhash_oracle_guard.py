"""Oracle parity for the LSH max_bucket truncation guard WHEN IT BINDS —
the minhash analogue of tests/test_simhash_oracle_guard.py. The gate
corpus never fills a band bucket past 256, so the driver exercises the
guard-on oracle only in its no-op regime; this test builds a hot-bucket
corpus (a family of near-identical docs that collide in every band) and
pins engine == DuckDB with a cap small enough to bind. Also covers the
broadcast_candidates=False shuffle-join path (identical results).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from etl_edi_data_scrapper_spark.functions.dedup import (
    jaccard_pairs,
    minhash_candidate_pairs,
)
from etl_edi_data_scrapper_spark.suite import _minhash_oracle

# one 30-member near-dup family (identical text -> identical signatures ->
# every band bucket holds all 30) + distinct background docs
_DOCS = [
    (i, "the quick brown fox jumps over the lazy dog again and again")
    for i in range(30)
] + [
    (100 + i, f"background document number {i} with its own distinct words {i * 3}")
    for i in range(8)
]


def _oracle_pairs(max_bucket):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    sql = f"SELECT a, b FROM ({_minhash_oracle(max_bucket=max_bucket)}) t"
    return sorted(map(tuple, con.sql(sql).fetchall()))


def _engine_pairs(spark, max_bucket):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    cand = minhash_candidate_pairs(df, n_hashes=12, bands=4, max_bucket=max_bucket)
    return sorted((r.a, r.b) for r in cand.collect())


def test_lsh_guard_binding_matches_oracle(spark):
    unguarded = _engine_pairs(spark, None)
    guarded = _engine_pairs(spark, 4)
    assert len(guarded) < len(unguarded)  # the cap must actually bind
    assert set(guarded) <= set(unguarded)
    # truncation keeps the smallest ids: the 4-member head of the family
    assert (0, 1) in guarded and (28, 29) not in guarded
    assert guarded == _oracle_pairs(4)


def test_lsh_guard_nonbinding_is_identity(spark):
    assert _engine_pairs(spark, 10_000) == _engine_pairs(spark, None)
    assert _oracle_pairs(10_000) == _oracle_pairs(None)


def test_jaccard_shuffle_join_path_matches_broadcast(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    cand = minhash_candidate_pairs(df, n_hashes=12, bands=4, max_bucket=4)
    via_broadcast = sorted(
        tuple(r) for r in jaccard_pairs(df, cand, broadcast_candidates=True).collect()
    )
    via_shuffle = sorted(
        tuple(r) for r in jaccard_pairs(df, cand, broadcast_candidates=False).collect()
    )
    assert via_broadcast == via_shuffle and via_broadcast
    # r13: 'auto' (default) — whether the plan-estimate gate fires (tiny
    # frame -> broadcast, no probe) or the probe path runs, the verdicts
    # must be identical to both explicit strategies
    via_auto = sorted(
        tuple(r) for r in jaccard_pairs(df, cand).collect()
    )
    assert via_auto == via_broadcast


def test_dense_small_estimate_corpus_forced_onto_probe(spark, monkeypatch):
    """r14 (r13 verdict #3): the no-probe broadcast fast path must be
    density-guarded. A dense corpus (one big near-dup family) keeps
    Catalyst's plan estimate tiny while the REAL pair count explodes
    quadratically; with the exact `candidate_pair_bound` wired in, the
    fast path must refuse and fall through to the count probe, which
    (with a lowered pair cap) lands on the sort-merge join — never a
    bound-blind broadcast. Sparse corpora keep the fast path."""
    from etl_edi_data_scrapper_spark.functions import dedup

    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    cand, bound = minhash_candidate_pairs(
        df, n_hashes=12, bands=4, max_bucket=None, with_bound=True
    )
    # exact bound: the 30-member family contributes C(30,2)=435 per band
    # pre-distinct -> 4*435 = 1740, plus 6 pairs from background docs
    # whose minhash bands happen to collide (deterministic md5 hashing)
    assert bound() == 1746

    # force the density mismatch: estimate is tiny (covered by the fast
    # path threshold) but the bound exceeds a lowered pair cap -> the
    # probe must run and pick the merge join
    monkeypatch.setattr(dedup, "_BROADCAST_PAIRS_MAX", 400)
    out = jaccard_pairs(df, cand, pair_bound=bound)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
    rows = sorted((r.a, r.b) for r in out.collect())
    monkeypatch.undo()

    # same inputs, default cap: fast path broadcasts, identical verdicts
    cand2, bound2 = minhash_candidate_pairs(
        df, n_hashes=12, bands=4, max_bucket=None, with_bound=True
    )
    fast = jaccard_pairs(df, cand2, pair_bound=bound2)
    plan_fast = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_fast
    assert sorted((r.a, r.b) for r in fast.collect()) == rows

    # no bound supplied -> 'auto' must always probe (the estimate alone
    # can never certify a broadcast), still correct
    cand3 = minhash_candidate_pairs(df, n_hashes=12, bands=4)
    no_bound = jaccard_pairs(df, cand3)
    assert sorted((r.a, r.b) for r in no_bound.collect()) == rows


def test_candidate_pair_bound_respects_max_bucket(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    _, bound4 = minhash_candidate_pairs(
        df, n_hashes=12, bands=4, max_bucket=4, with_bound=True
    )
    # truncated family buckets: 4 bands * C(4,2) = 24, plus the same 6
    # size-2 background-collision buckets (untruncated at cap 4)
    assert bound4() == 30
