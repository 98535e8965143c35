#!/usr/bin/env python
"""Per-query measurement harness for optimization rounds.

Times the named queries (bench methodology: xxhash64-struct reduction,
warm session, median of --reps) and optionally dumps each query's
``explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt so plan
claims in OPTIMIZATION_r*.md are checkable without running Spark.

Usage::

    python scripts/profile_query.py --queries a,b,c [--reps 5]
        [--plans plans/r14 --suffix before] [--sf-dir /root/testdata/sf0.1]

Prints one JSON line {"queries": {name: median_sec}, "reps": N}.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from via_spark.session import get_spark

    spark = get_spark("via_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]

    def force(df):
        df.select(
            F.xxhash64(F.struct(*[F.col(c) for c in df.columns])).alias("h")
        ).agg(F.count("h"), F.max("h")).collect()

    # session warmup (JVM codegen + python workers), mirrors bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            plans_dir = Path(args.plans)
            plans_dir.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf_dir)
            # EXECUTED plan: run an action on THIS DataFrame's own
            # QueryExecution (force() builds a derived reduction plan, which
            # would leave df's AQE plan un-finalized), then explain — so the
            # dump is the final plan (isFinalPlan=true) and reuse/strategy
            # claims are verifiable (r14 VERDICT item 2).
            df.collect()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (plans_dir / f"{name}_{args.suffix}.txt").write_text(plan)
        spark.sparkContext.setJobDescription(f"profile: {name}")
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            force(fn(spark, args.sf_dir))
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 4)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": out, "reps": args.reps}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
