"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes fully through the noop sink (no collect — measures the
whole plan incl. shuffles, not driver materialization).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from etl_edi_data_scrapper_spark import get_spark
    from etl_edi_data_scrapper_spark.suite import QUERIES

    spark = get_spark("bench")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm (JIT, listing)
            best = None
            for _ in range(2):  # min-of-2: damp GC/codegen noise in one JVM
                t0 = time.perf_counter()
                df2 = fn(spark, sf_dir)
                df2.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as e:  # one broken query must not kill the report
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
