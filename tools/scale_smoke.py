"""Scale-up smoke: replicate the sf0.1 tables ~10x into /tmp and measure how
the suite's heaviest operators scale with input size.

The point is the EXPONENT, not the absolute seconds: an operator whose cost
is linear in input (scan-bound, bounded-block candidate generation) should
show time ratio ≈ data ratio on a fixed-size executor pool; anything
super-linear (degenerate blocking, accidental all-pairs, driver
materialization) shows up immediately as a ratio >> 10. Run ad hoc:

    python tools/scale_smoke.py            # writes/reuses /tmp/scale_sf1
    python tools/scale_smoke.py --factor 5

Prints one JSON line: {"factor": F, "queries": {name: {"base": s, "scaled":
s, "ratio": r}}, ...}. Replication keeps key structure honest: orderkeys and
doc/vec ids are offset per copy (so merge/window/dedup groups GROW in count,
not in size), part/supplier keys are reused (so join fan-in grows like real
data), and document text is perturbed per copy (so dedup does not collapse
the copies into one giant cluster).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"

# heavy / structurally interesting representatives (name -> suite query);
# includes the bench's current most-expensive queries so per-round reports
# always cover the top of the cost table
QUERIES = [
    "keyed_merge",
    "keyed_merge_salted",
    "pipeline_e2e",
    "window_rank",
    "join_q3",
    "minhash_lsh",
    "dedup_clusters",
    "simhash_pairs",
    "tfidf_topk",
    "kmeans",
    "pii_scrub",  # r6: the span-dedup leg is a new shuffle surface
    "text_fingerprints",  # r7: the sliding exsub leg shuffles one row per token
    "domain_mixture",  # r7: the DSIR leg explodes unigram+bigram buckets
    "ann_topk",
    "ann_recall",
    "vocab_topk",
    "cogroup_stats",
    "pack_sequences",
    "chunk_documents",
    # NOT semdedup: with k fixed its within-cluster self-join is quadratic
    # in cluster size BY DESIGN (SemDeDup scales k with corpus size — the
    # knob, see SCALE.md); the smoke hunts ACCIDENTAL super-linearity.
    # Measured r13: gate-path semdedup at 300x is ~5.6e10 cosine pairs
    # (375k-vector clusters), killed after 25 min; the designed scaled
    # operating point is --only semdedup_scaledk (29.6x at 300x).
]

# a linear operator on a fixed 32-thread pool should scale ≈ data ratio;
# allow ~20% shuffle/log-factor headroom before flagging super-linear
FLAG_RATIO = 12.0


def build_scaled(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    copies = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("__copy")

    def done(name: str) -> bool:
        return os.path.exists(os.path.join(out_dir, name + ".parquet", "_SUCCESS"))

    # small dims: copy as-is (broadcast sides should stay small at scale)
    for name in ["region", "nation", "customer", "supplier", "part"]:
        if done(name):
            continue
        spark.read.parquet(f"{BASE_SF}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")

    if not done("orders"):
        o = spark.read.parquet(f"{BASE_SF}/orders.parquet").select("*", copies)
        o = o.withColumn(
            "o_orderkey", F.col("o_orderkey") * factor + F.col("__copy")
        ).drop("__copy")
        o.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    if not done("lineitem"):
        li = spark.read.parquet(f"{BASE_SF}/lineitem.parquet").select("*", copies)
        li = li.withColumn(
            "l_orderkey", F.col("l_orderkey") * factor + F.col("__copy")
        ).drop("__copy")
        li.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    if not done("events"):
        ev = spark.read.parquet(f"{BASE_SF}/events.parquet").select("*", copies)
        ev = (
            ev.withColumn("event_id", F.col("event_id") * factor + F.col("__copy"))
            .withColumn("user_id", F.col("user_id") * factor + F.col("__copy"))
            .drop("__copy")
        )
        ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    if not done("documents"):
        d = spark.read.parquet(f"{BASE_SF}/documents.parquet").select("*", copies)
        # perturb: prefix a copy-specific token so replicas are near-dups of
        # the original, not byte-dups (keeps dedup/minhash work honest)
        d = (
            d.withColumn("doc_id", F.col("doc_id") * factor + F.col("__copy"))
            .withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                    F.concat(F.lit("copyvariant"), F.col("__copy"), F.lit(" "), F.col("text"))
                ),
            )
            .drop("__copy")
        )
        d.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    if not done("embeddings"):
        e = spark.read.parquet(f"{BASE_SF}/embeddings.parquet").select("*", copies)
        # tiny deterministic per-copy rotation of one coordinate keeps
        # vectors distinct without changing the distribution
        e = (
            e.withColumn("vec_id", F.col("vec_id") * factor + F.col("__copy"))
            .withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, i) -> CASE WHEN i = __copy % size(embedding) "
                    "THEN x + 0.001 * (__copy + 1) ELSE x END)"
                ),
            )
            .drop("__copy")
        )
        e.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def time_query(fn, spark, sf_dir: str, trials: int = 2) -> float:
    """warm + min-of-``trials``. ``trials=1`` skips the warm run and times a
    single cold execution — for factor-300 rows where a run is many minutes,
    JIT/listing warm-up is noise relative to the run and tripling the cost
    for min-of-2 buys nothing; a single cold run only OVER-states the scaled
    time, so the resulting ratio is conservative."""
    if trials <= 1:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def time_neardup_increment(
    spark, sf_dir: str, work_dir: str, trials: int = 2
) -> float:
    """The production ingestion shape (streaming/neardup_stream.py): seed
    the band-key store with half the documents table (untimed), then time
    ONE increment of the other half against it — candidate band equi-join
    against the store, intra-batch clustering, verify, append. Both the
    batch AND the store scale with the factor, so this measures the one
    shuffle surface the per-query smoke misses: the store join. Each trial
    gets a fresh store (the call appends, so rerunning against the same
    store would not be the same work); min-of-2 damps JIT/GC noise."""
    import shutil

    from etl_edi_data_scrapper_spark.streaming.neardup_stream import (
        dedup_batch_against_store,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    best = None
    for trial in range(trials):
        store = os.path.join(work_dir, f"store_{trial}")
        shutil.rmtree(store, ignore_errors=True)
        dedup_batch_against_store(spark, docs.filter("doc_id % 2 = 0"), store)
        batch = docs.filter("doc_id % 2 = 1")
        t0 = time.perf_counter()
        dedup_batch_against_store(spark, batch, store)  # eager: checkpoint+append
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def time_semdedup_scaledk(spark, sf_dir: str, k: int, fit_fraction, ivf_probe) -> float:
    """SemDeDup is excluded from the per-query smoke BY DESIGN: with k
    FIXED, within-cluster pair work grows quadratically in cluster size —
    the paper's contract is k ∝ N so clusters stay constant-size, which
    the suite query (gate-exact, knobs off) cannot exercise. This leg
    measures the contract as deployed at scale: base = suite defaults
    (k=8, exact flat assignment) on sf0.1; scaled = k×factor with the r6
    web-scale knobs ON (fit_fraction=1/factor → Lloyd's on a
    ~constant-size md5 sample; ivf_probe=4 → O(√k + probe·k/√k) routed
    assignment). A sub-linear ratio is the measured proof that the knobs
    deliver the paper's k-scaling. min-of-2, noop sink, like time_query."""
    from etl_edi_data_scrapper_spark.functions.clustering import semantic_dedup

    def run() -> float:
        df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.perf_counter()
        semantic_dedup(
            df, k=k, fit_fraction=fit_fraction, ivf_probe=ivf_probe
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run()  # warm
    return round(min(run() for _ in range(2)), 3)


def time_semdedup_sharded(spark, sf_dir: str, rows_per_shard: int) -> float:
    """Shard-bounded SemDeDup (clustering.semantic_dedup_sharded) — the
    linear-total answer to the k ∝ N asymptote, wired in r7. Per-shard
    size stays FIXED as data grows (that is the contract), so shard count
    grows with N and total work is linear. Caveat for reading the base:
    sf0.1 has only 2000 embeddings → 2 shards on a 32-thread pool, so the
    base underuses the pool and the raw base→scaled ratio flatters;
    compare SCALED times across factors (10× vs 100× should differ ~10×)
    for the honest linearity read. min-of-2, noop sink, like time_query."""
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    def run() -> float:
        df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.perf_counter()
        semantic_dedup_sharded(df, rows_per_shard=rows_per_shard).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    run()  # warm
    return round(min(run() for _ in range(2)), 3)


def time_semdedup_bridge(spark, sf_dir: str, rows_per_shard: int = 1000) -> float:
    """Bridged multipass SemDeDup (r9 recall knob): one sharded pass PLUS
    the cross-shard LSH bridge (2 tables × 16 hyperplanes, exact-verify
    within buckets, max_block guard). The bridge is 2 blocked self-joins
    over the full corpus — linear by construction; this row is the
    measured evidence (compare SCALED times across factors, as with
    time_semdedup_sharded — the tiny base underuses the pool)."""
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded_multipass,
    )

    def run() -> float:
        df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.perf_counter()
        semantic_dedup_sharded_multipass(
            df,
            n_passes=1,
            rows_per_shard=rows_per_shard,
            threshold=0.9,
            bridge_tables=2,
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run()  # warm
    return round(min(run() for _ in range(2)), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated subset of suite queries to measure (any "
        "registered query name — used by the per-round rotating 30x "
        "spot-check; 'neardup_increment' selects the store-join timing leg)",
    )
    ap.add_argument(
        "--trials",
        type=int,
        default=2,
        help="timed runs per query (min is reported); 1 = single cold run, "
        "no warm — for very large factors where a run is many minutes",
    )
    args = ap.parse_args()
    out_dir = args.out or f"/tmp/scale_sf{args.factor}x"

    from etl_edi_data_scrapper_spark import get_spark
    from etl_edi_data_scrapper_spark.suite import QUERIES as ALL

    spark = get_spark("scale-smoke")
    build_scaled(spark, out_dir, args.factor)

    if args.only:
        selected = [q for q in args.only.split(",") if q]
        special = {
            "semdedup_scaledk",
            "semdedup_sharded",
            "semdedup_bridge",
            "neardup_increment",
        }
        unknown = [q for q in selected if q not in ALL and q not in special]
        if unknown:
            ap.error(f"unknown queries: {unknown}")
        run_queries = [q for q in selected if q not in special]
        run_neardup = "neardup_increment" in selected
        run_semdedup = "semdedup_scaledk" in selected
        run_sharded = "semdedup_sharded" in selected
        run_bridge = "semdedup_bridge" in selected
    else:
        run_queries = QUERIES
        run_neardup = True
        run_semdedup = False
        run_sharded = True  # cheap (bounded shards) and guards the r7 op
        run_bridge = False

    report: dict[str, dict[str, float]] = {}
    for name in run_queries:
        fn = ALL[name]
        base = time_query(fn, spark, BASE_SF)  # base is cheap: keep warm+min-of-2
        scaled = time_query(fn, spark, out_dir, trials=args.trials)
        report[name] = {
            "base": base,
            "scaled": scaled,
            "ratio": round(scaled / base, 2) if base > 0 else None,
        }
        print(f"# {name}: {base}s -> {scaled}s (x{report[name]['ratio']})", file=sys.stderr)

    if run_neardup:
        import shutil
        import tempfile

        nd_work = tempfile.mkdtemp(prefix="scale_neardup_")
        try:
            nd_base = time_neardup_increment(spark, BASE_SF, os.path.join(nd_work, "base"))
            nd_scaled = time_neardup_increment(
                spark, out_dir, os.path.join(nd_work, "scaled"), trials=args.trials
            )
        finally:
            shutil.rmtree(nd_work, ignore_errors=True)
        report["neardup_increment"] = {
            "base": nd_base,
            "scaled": nd_scaled,
            "ratio": round(nd_scaled / nd_base, 2) if nd_base > 0 else None,
        }
        print(
            f"# neardup_increment: {nd_base}s -> {nd_scaled}s "
            f"(x{report['neardup_increment']['ratio']})",
            file=sys.stderr,
        )

    if run_semdedup:
        sd_base = time_semdedup_scaledk(spark, BASE_SF, 8, None, None)
        sd_scaled = time_semdedup_scaledk(
            spark, out_dir, 8 * args.factor, 1.0 / args.factor, 4
        )
        report["semdedup_scaledk"] = {
            "base": sd_base,
            "scaled": sd_scaled,
            "ratio": round(sd_scaled / sd_base, 2) if sd_base > 0 else None,
        }
        print(
            f"# semdedup_scaledk: {sd_base}s -> {sd_scaled}s "
            f"(x{report['semdedup_scaledk']['ratio']})",
            file=sys.stderr,
        )

    if run_sharded:
        sh_base = time_semdedup_sharded(spark, BASE_SF, 1000)
        sh_scaled = time_semdedup_sharded(spark, out_dir, 1000)
        report["semdedup_sharded"] = {
            "base": sh_base,
            "scaled": sh_scaled,
            "ratio": round(sh_scaled / sh_base, 2) if sh_base > 0 else None,
        }
        print(
            f"# semdedup_sharded: {sh_base}s -> {sh_scaled}s "
            f"(x{report['semdedup_sharded']['ratio']})",
            file=sys.stderr,
        )

    if run_bridge:
        br_base = time_semdedup_bridge(spark, BASE_SF, 1000)
        br_scaled = time_semdedup_bridge(spark, out_dir, 1000)
        report["semdedup_bridge"] = {
            "base": br_base,
            "scaled": br_scaled,
            "ratio": round(br_scaled / br_base, 2) if br_base > 0 else None,
        }
        print(
            f"# semdedup_bridge: {br_base}s -> {br_scaled}s "
            f"(x{report['semdedup_bridge']['ratio']})",
            file=sys.stderr,
        )

    flagged = sorted(
        q
        for q, r in report.items()
        if r["ratio"] is not None and r["ratio"] > FLAG_RATIO * args.factor / 10
    )
    print(
        json.dumps(
            {
                "factor": args.factor,
                "base_sf": 0.1,
                "flag_ratio": FLAG_RATIO * args.factor / 10,
                "queries": report,
                "flagged_superlinear": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
