"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
The stdout line is kept COMPACT (the driver captures a bounded tail); the
full report, including the per-query vs_baseline map, is also written to
BENCH_FULL.json beside this script.

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


def _cpu_calibration() -> float:
    """Seconds for a FIXED single-thread workload (md5 over 64 MB) — a
    machine-speed probe. The suite totals only compare across rounds when
    the host is equally quiet; this lets a reader normalize (calib was
    ~0.08 s on an idle host; 2x that means the suite numbers are inflated
    by external load, not by plan regressions)."""
    import hashlib

    blob = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.md5()
    for _ in range(64):
        h.update(blob)
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    # external-load probe BEFORE Spark spins up its 32 threads (the
    # end-of-run load_avg_1m mostly measures the bench itself): r7's bench
    # started at load 8+, produced three >1.5x non-scope ratios on a host
    # the calibration said was fast, and only breach candidates were
    # re-timed — so the numbers shipped inflated (semdedup read 13.0 s vs
    # 4.3 s idle). Now ANY query over 1.5x gets a confirmation re-time,
    # and a hot start is flagged on the compact line.
    load_start = round(os.getloadavg()[0], 2)
    # r9 (verdict finding 1): a hot start is no longer certified. First
    # try to OUTWAIT the load (bounded — external load on a shared host is
    # usually another process's burst); if the host never goes quiet, run
    # anyway for the timings but withhold baseline_pass (null = "not
    # certified") instead of letting a gate that detected its own
    # invalidating condition certify the run (r8 shipped start-load 7.82).
    # r13 (verdict #5): the r12 suite certified after a 30 s wait at load
    # 2.77 and drifted +19% raw with broad slowdowns on untouched queries
    # — the old >4.0 trigger was too lenient. Now wait for load ≤ 1.0
    # (up to 10 min), and anything still above 2.5 at start withholds
    # certification, not just 4.0.
    hot_waited = 0
    while load_start > 1.0 and hot_waited < 600:
        time.sleep(30)
        hot_waited += 30
        load_start = round(os.getloadavg()[0], 2)
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
    calib = _cpu_calibration()
    out = {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_md5_64mb_sec": calib,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "load_avg_start_1m": load_start,
    }
    if hot_waited:
        out["hot_start_waited_sec"] = hot_waited
    if load_start > 2.5:
        out["load_hot_start"] = True  # timings run, certification withheld

    # self-detecting regression gate: host-normalized per-query ratio vs the
    # committed absolute anchor (BASELINE_LOCAL.md); >2.0 breaches the
    # BASELINE.md envelope unless the query is a documented scope growth
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_LOCAL.json")
    if os.path.exists(base_path) and sf == 0.1:
        with open(base_path) as fh:
            base = json.load(fh)
        b_calib = base["calib_md5_64mb_sec"]
        noted = set(base.get("scope_notes", {}))
        ratios = {
            q: round((t / calib) / (base["queries"][q] / b_calib), 2)
            for q, t in timings.items()
            if q in base["queries"]
        }
        def breach(q: str) -> bool:
            # relative AND absolute: a 0.1 s query jittering to 0.25 s is
            # scheduler noise, not a plan regression — require the
            # normalized excess over baseline to also exceed 0.5 s
            norm_now = timings[q] / calib
            norm_base = base["queries"][q] / b_calib
            return ratios[q] > 2.0 and (norm_now - norm_base) * calib > 0.5

        # shared-host noise produces transient 2-8x swings on single
        # queries (measured the same untouched projection at 0.8x and 8x
        # an hour apart); a genuine plan regression reproduces, noise does
        # not — so re-time every >1.4x candidate once and keep the min
        # (r8: was breach-only, which let r7's load-inflated semdedup 2.3x
        # ship without a confirmation pass; r13: trigger lowered 1.5→1.4
        # after the suite max landed at 1.47 and 1.46 — just under the
        # old trigger — two rounds running, shipping unconfirmed both
        # times). r11: the retime runs in a FRESH SparkSession — 50
        # queries of accumulated session state (heap fragmentation,
        # broadcast/cleaner backlog, Python worker residue) inflated an
        # untouched Pandas-UDF query to 3.2x its anchor INSIDE the bench
        # session while a fresh session measured it at its anchor; an
        # in-session retime re-measures the noise, not the query. A real
        # plan regression reproduces fresh. r13 (verdict #5): the top-3
        # movers ALWAYS retime fresh-session, threshold or not, so a
        # broad-drift round documents its movers instead of shipping
        # them unmeasured.
        top_movers = sorted(ratios, key=ratios.get, reverse=True)[:3]
        candidates = sorted(
            set(top_movers)
            | {q for q in ratios if breach(q) or ratios[q] > 1.4}
        )
        if candidates:
            from etl_edi_data_scrapper_spark.suite import QUERIES as _Q

            spark.stop()
            spark = get_spark("bench-retime")
            for q in candidates:
                try:
                    fn = _Q[q]
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    best = None
                    for _ in range(2):
                        t0 = time.perf_counter()
                        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                    timings[q] = round(min(timings[q], best), 3)
                    ratios[q] = round(
                        (timings[q] / calib) / (base["queries"][q] / b_calib), 2
                    )
                except Exception:
                    pass
            out["retimed"] = sorted(candidates)
            out["value"] = round(sum(timings.values()), 3)  # totals track the min policy

        out["vs_baseline"] = ratios
        srt = sorted(ratios.values())
        out["vs_baseline_mean"] = round(sum(srt) / len(srt), 2) if srt else None
        out["vs_baseline_max"] = (
            max(ratios, key=ratios.get) + ":" + str(srt[-1]) if srt else None
        )
        out["baseline_breaches"] = sorted(
            q for q in ratios if breach(q) and q not in noted
        )
        # sub-second queries over 2.0x are excluded from breaches by the
        # 0.5 s-excess rule (scheduler jitter dominates them), but a query
        # drifting >2x for consecutive rounds should stay VISIBLE without
        # reading BENCH_FULL.json — surface them on the compact line
        out["soft_over_2x"] = sorted(
            q for q in ratios if ratios[q] > 2.0 and not breach(q) and q not in noted
        )
        out["baseline_scope_grown"] = sorted(
            q for q in ratios if ratios[q] > 2.0 and q in noted
        )
        # a baseline query that ERRORED has no timing — that is the worst
        # regression of all and must fail the gate, not silently vanish
        out["baseline_missing"] = sorted(
            q for q in base["queries"] if q not in timings
        )
        if out.get("load_hot_start"):
            # breaches still FAIL on a hot host (a regression that shows
            # under load is still a regression candidate), but a clean run
            # is NOT certified — null means "re-run idle to certify"
            failed = out["baseline_breaches"] or out["baseline_missing"]
            out["baseline_pass"] = False if failed else None
        else:
            out["baseline_pass"] = (
                not out["baseline_breaches"] and not out["baseline_missing"]
            )
    if errors:
        out["errors"] = errors

    # full report → file (the driver captures only a bounded stdout tail;
    # r4's final line outgrew it and BENCH_r04.json recorded parsed:null)
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as fh:
        json.dump(out, fh, indent=1)
    # stdout gets a COMPACT final line: per-query timings + gate verdict,
    # without the 50-entry vs_baseline map (mean/max + breach lists carry
    # the decision; the full map lives in BENCH_FULL.json)
    compact = {k: v for k, v in out.items() if k != "vs_baseline"}
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
