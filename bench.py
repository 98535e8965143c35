#!/usr/bin/env python
"""Benchmark harness: time every headline query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Timing methodology: each query is forced end-to-end by hashing EVERY
output column into one JVM-side xxhash64 reduction — a bare ``count()``
lets Catalyst column-prune expensive projections (a simhash query would
"finish" without computing a single fingerprint). The reduction ships
one row to the driver, so transfer skew stays out of the numbers. A
warmup pass on the first query amortizes JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return float(m.group(1)) if m else -1.0
    except ValueError:
        return -1.0


def _force(df) -> None:
    """Materialize every output column (defeats column pruning)."""
    from pyspark.sql import functions as F

    df.select(
        F.xxhash64(F.struct(*[F.col(c) for c in df.columns])).alias("h")
    ).agg(F.count("h"), F.max("h")).collect()


def main() -> None:
    import __spark_entry__ as entrymod
    from via_spark.session import get_spark

    spark = get_spark("via_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()

    # Warmup: run the first query once to absorb JVM + codegen startup.
    first = next(iter(qs))
    try:
        _force(qs[first](spark, SF_DIR))
    except Exception:
        pass

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            _force(fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
        except Exception as exc:  # a broken query must not hide the rest
            dt = time.perf_counter() - t0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)
        timings[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
