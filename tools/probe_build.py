"""Warm no-action plan-CONSTRUCTION probe: times fn(spark, sf_dir) without
any action, after one warmup build. Separates driver-side plan build (py4j
round trips, literal conversion, lazy-checkpoint materializations) from
execution. NOT the bench — evidence for construction-sweep claims only.

Usage: python tools/probe_build.py [-n TRIALS] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    trials = 3
    if args and args[0] == "-n":
        trials = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_edi_data_scrapper_spark import get_spark
    from etl_edi_data_scrapper_spark.suite import QUERIES

    spark = get_spark("probe-build")
    out: dict[str, float] = {}
    for name in args:
        fn = QUERIES[name]
        fn(spark, sf_dir)  # warmup (parquet listing, codegen cache, JIT)
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(json.dumps({name: out[name], "load": round(os.getloadavg()[0], 2)}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
