"""Factor-300 A/B of Arrow(pandas) vs expr execution for the k<=64
higher-order-function paths (r14 verdict item 3): assign_clusters,
ivf_assign, pq_encode, pq_adc_topk, ivfpq_topk at scale geometry
(/tmp/scale_sf300x embeddings, 600k rows x 64 dims — build it with
tools/scale_smoke.py or the build_scaled helper first).

Both strategies are bit-compatible by construction (parity-tested); this
measures EXECUTION so the auto crossover (expr at or under 64 cells /
512 codebook entries, Arrow above) is justified by numbers, not a guess.

Usage: python tools/arrow_expr_study.py [--dir /tmp/scale_sf300x] [--trials 2]
Prints one JSON line per leg + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, build, trials):
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out = {label: round(best, 3), "load": round(os.getloadavg()[0], 2)}
    print(json.dumps(out), flush=True)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf300x")
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark import get_spark
    from etl_edi_data_scrapper_spark.functions.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from etl_edi_data_scrapper_spark.functions.similarity import (
        ivf_assign,
        ivf_index,
        pq_adc_topk,
        pq_encode,
        sample_codebooks_local,
    )

    spark = get_spark("arrow-expr-study")
    emb = spark.read.parquet(f"{args.dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_rows = emb.count()
    report: dict = {"dir": args.dir, "rows": n_rows, "trials": args.trials}

    # centroid sets: gate geometry (k=8) and the crossover boundary (k=64)
    cen8, _ = kmeans_fit(emb.limit(4000), k=8, n_iters=1)
    cen64 = [
        [float(r.embedding[d]) for d in range(len(r.embedding))]
        for r in emb.limit(64).collect()
    ]
    for k, cens in (("k8", cen8), ("k64", cen64)):
        for strat in ("expr", "pandas"):
            report[f"assign_{k}_{strat}"] = timed(
                f"assign_{k}_{strat}",
                lambda s=strat, c=cens: assign_clusters(emb, "embedding", c, strategy=s),
                args.trials,
            )

    # ivf_assign at the gate's 16 cells
    centroids, _ = ivf_index(emb, n_centroids=16)
    cen_df = centroids.localCheckpoint()
    for strat in ("expr", "pandas"):
        report[f"ivf_assign_16_{strat}"] = timed(
            f"ivf_assign_16_{strat}",
            lambda s=strat: ivf_assign(emb, cen_df, strategy=s),
            args.trials,
        )

    # PQ family at gate geometry (8 x 16 = 128 entries, expr side of the
    # 512-entry auto threshold)
    cbs = sample_codebooks_local(emb, m_sub=8, n_codes=16, dim=64)
    for strat in ("literal", "pandas"):
        report[f"pq_encode_{strat}"] = timed(
            f"pq_encode_{strat}",
            lambda s=strat: pq_encode(emb, cbs, strategy=s),
            args.trials,
        )
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "q_id"
    ).withColumnRenamed("embedding", "q_vec").localCheckpoint()
    enc = pq_encode(emb, cbs, strategy="pandas").localCheckpoint()
    for strat in ("expr", "pandas"):
        report[f"pq_adc_topk_{strat}"] = timed(
            f"pq_adc_topk_{strat}",
            lambda s=strat: pq_adc_topk(queries, cbs, enc, k=5, strategy=s),
            args.trials,
        )

    print(json.dumps(report))


if __name__ == "__main__":
    main()
