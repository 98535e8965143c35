"""Measured scale-up probe for the STORE FIXPOINTS themselves.

The per-query scale probes (scripts/scaleup_probe.py) time queries that
SCAN the persisted label stores — which deliberately hides the
amortized cost of building them (k-means, connected components run once
per dataset). VERDICT r9 ask #5: time the builds at 10x/30x and commit
the curve, so a super-linear fixpoint can't hide behind an amortized
read path.

Reuses scaleup_probe.build_scaled (same replication rules: disjoint
vocabularies, offset keys — K x multiplies WORK, not pathology) and
times each store's COMPUTE function directly (the exact plan
``store.*`` materializes on first use), cold per call: no persisted
store is read or written.

Usage::

    python scripts/scaleup_stores.py [--factor 10] [--reps 3]

Prints one JSON line:
{"factor": K, "stores": {name: {"t1": s, "tk": s, "ratio": r}}, ...}.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from via_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _force(df) -> None:
    cols = [F.col(c) for c in df.columns]
    df.select(F.xxhash64(F.struct(*cols)).alias("h")).agg(
        F.count("h"), F.max("h")
    ).collect()


def _timed(fn, reps: int) -> float:
    fn()  # warm: plan + shuffle files + code cache
    return statistics.median(
        [(lambda t0: (fn(), time.time() - t0)[1])(time.time()) for _ in range(reps)]
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/via_scaleup_stores")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("scaleup-stores")
    out = Path(args.out)

    from scripts.scaleup_probe import build_scaled

    build_scaled(spark, out, args.factor)

    from via_spark.operators import graph, vector
    from via_spark.operators.dedup import EMB_COS_THRESHOLD, JACCARD_THRESHOLD
    from via_spark.operators.multimodal import PHASH_MAX_HAMMING

    builders = {
        "cluster_labels": lambda sf: graph.dedup_clusters_compute(
            spark, sf, JACCARD_THRESHOLD
        ),
        "embedding_cluster_labels": lambda sf: graph.embedding_clusters_compute(
            spark, sf, EMB_COS_THRESHOLD
        ),
        "phash_cluster_labels": lambda sf: graph.phash_clusters_compute(
            spark, sf, PHASH_MAX_HAMMING
        ),
        "semdedup_labels": lambda sf: vector.semdedup_compute(spark, sf),
    }

    report = {}
    for name, build in builders.items():
        t1 = _timed(lambda: _force(build(SF_DIR)), args.reps)
        tk = _timed(lambda: _force(build(str(out))), args.reps)
        report[name] = {
            "t1": round(t1, 3),
            "tk": round(tk, 3),
            "ratio": round(tk / max(t1, 1e-9), 2),
        }
        print(f"# {name}: {report[name]}", file=sys.stderr)
    worst = max(report.values(), key=lambda r: r["ratio"])["ratio"]
    print(
        json.dumps(
            {
                "factor": args.factor,
                "reps": args.reps,
                "worst_ratio": worst,
                "stores": report,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
