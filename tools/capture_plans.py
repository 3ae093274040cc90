"""Capture .explain("formatted") for every suite query into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file becomes plans/<round>/<query>_<suffix>.txt)
  round: $EDI_PLANS_ROUND, default 'r15'

Plan-building some queries runs bounded driver jobs (kmeans fits,
codebook samples), so this spins up one SparkSession at the bench core
count and walks the registry sequentially.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("EDI_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from etl_edi_data_scrapper_spark import get_spark
    from etl_edi_data_scrapper_spark.suite import QUERIES

    spark = get_spark("capture-plans")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(name, "->", path, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
