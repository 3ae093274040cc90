"""Isolated per-query timer (bench methodology: noop sink, warm + min-of-N)
for optimization A/B work. NOT the bench — numbers of record come from
bench.py; this exists so a single query can be measured without paying the
50-query suite.

Usage: python tools/time_queries.py [-n TRIALS] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    trials = 2
    if args and args[0] == "-n":
        trials = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_edi_data_scrapper_spark import get_spark
    from etl_edi_data_scrapper_spark.suite import QUERIES

    spark = get_spark("time-queries")
    out: dict[str, float] = {}
    for name in args:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"time:{name}:warm")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for i in range(trials):
            spark.sparkContext.setJobDescription(f"time:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(json.dumps({name: out[name], "load": round(os.getloadavg()[0], 2)}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
