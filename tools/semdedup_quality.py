"""Measure the QUALITY claim of shard-bounded multi-pass SemDeDup on real
embeddings: what fraction of true semantic duplicates does each pass
still miss, and does the residue decay geometrically as the docstring
(`clustering.py::semantic_dedup_sharded_multipass`) argues?

Ground truth is computed exactly, blocked on the driver: a vector is a
true duplicate when ANY lower-id vector sits within ``threshold`` cosine
(GLOBAL — no shard, no cluster blocking). The sharded verdicts are a
SUBSET of the truth by construction (a shard-local cluster pair is a
global pair), so precision is structurally 1.0 and the interesting
number is the missed fraction:

    missed(p) = 1 - |dropped by passes 1..p| / |true duplicates|

Run ad hoc (expects tools/scale_smoke.py to have built the scaled dir):

    python tools/semdedup_quality.py --factor 10
    python tools/semdedup_quality.py --factor 30 --threshold 0.9

Prints one JSON line: {"factor": F, "threshold": T, "n": N,
"true_dups": D, "per_pass": [{"passes": 1, "dropped": d1, "missed_frac":
m1}, ...], "subset_violations": 0}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def true_duplicates(ids, X, threshold: float) -> set:
    """Exact global verdicts, 1024-row blocked numpy (never N² at once)."""
    import numpy as np

    order = np.argsort(ids, kind="stable")
    ids, X = ids[order], X[order]
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = 1.0
    Xn = X / norms[:, None]
    n = len(ids)
    dup = np.zeros(n, dtype=bool)
    for lo in range(0, n, 1024):
        hi = min(lo + 1024, n)
        sims = Xn[lo:hi] @ Xn.T  # (block, n)
        col = np.arange(n)[None, :]
        row = np.arange(lo, hi)[:, None]
        dup[lo:hi] = ((sims >= threshold) & (col < row)).any(1)
    return set(ids[dup].tolist())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--dir", default=None, help="scaled dir (default /tmp/scale_sf{F}x)")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--max-passes", type=int, default=3)
    ap.add_argument("--rows-per-shard", type=int, default=1000)
    ap.add_argument(
        "--bridge-tables", type=int, default=0,
        help="enable the cross-shard LSH bridge with this many tables",
    )
    ap.add_argument("--bridge-planes", type=int, default=16)
    ap.add_argument(
        "--auto-target", type=float, default=None,
        help="auto-size geometry for this target missed_frac "
        "(plan_shard_geometry over the estimate_family_size probe)",
    )
    ap.add_argument(
        "--max-rows-per-shard", type=int, default=262144,
        help="memory bound handed to the geometry planner (auto mode)",
    )
    args = ap.parse_args()
    sf_dir = args.dir or f"/tmp/scale_sf{args.factor}x"

    import numpy as np

    from etl_edi_data_scrapper_spark import get_spark
    from etl_edi_data_scrapper_spark.functions.clustering import (
        estimate_family_size,
        plan_shard_geometry,
        semantic_dedup_sharded_multipass,
    )

    spark = get_spark("semdedup-quality")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    truth = true_duplicates(ids, X, args.threshold)

    per_pass = []
    violations = 0
    extra = {}
    planned = None
    if args.bridge_tables:
        extra["bridge_tables"] = args.bridge_tables
        extra["bridge_planes"] = args.bridge_planes
    if args.auto_target is not None:
        # record the probe + solved geometry the operator would choose
        # (the multipass call re-derives the same thing internally)
        fam = estimate_family_size(emb)
        rps, np_ = plan_shard_geometry(
            len(ids),
            max(2, int(fam)),
            args.auto_target,
            max_rows_per_shard=args.max_rows_per_shard,
        )
        planned = {
            "family_size_probe": round(fam, 3),
            "planned_rows_per_shard": rps,
            "planned_n_passes": np_,
        }
        print(f"# auto geometry: {planned}", file=sys.stderr)
        extra["target_missed_frac"] = args.auto_target
        extra["max_rows_per_shard"] = args.max_rows_per_shard
    pass_counts = [1] if args.auto_target is not None else list(
        range(1, args.max_passes + 1)
    )
    for p in pass_counts:
        verdicts = semantic_dedup_sharded_multipass(
            emb,
            n_passes=p,
            rows_per_shard=args.rows_per_shard,
            threshold=args.threshold,
            **extra,
        )
        dropped = {
            r[0] for r in verdicts.filter("NOT keep").select("vec_id").collect()
        }
        violations += len(dropped - truth)  # must stay 0: subset property
        per_pass.append(
            {
                "passes": planned["planned_n_passes"] if planned else p,
                "dropped": len(dropped),
                "missed_frac": round(1 - len(dropped) / len(truth), 4)
                if truth
                else None,
            }
        )
        print(f"# passes={p}: dropped {len(dropped)}/{len(truth)}", file=sys.stderr)

    print(
        json.dumps(
            {
                "factor": args.factor,
                "threshold": args.threshold,
                "rows_per_shard": args.rows_per_shard,
                "bridge_tables": args.bridge_tables,
                "bridge_planes": args.bridge_planes if args.bridge_tables else None,
                "auto_target": args.auto_target,
                "auto_geometry": planned,
                "n": int(len(ids)),
                "true_dups": len(truth),
                "per_pass": per_pass,
                "subset_violations": violations,
            }
        )
    )


if __name__ == "__main__":
    main()
