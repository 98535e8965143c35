"""Embedding near-dup gate soak: a duplicative vector feed at 10× the
reference ingest target, processed by the REAL streaming query
(readStream → foreachBatch via start_embedding_gate, one file per
micro-batch), asserting the r10 verdict's ask: the gate's signature
state stays bounded by DISTINCT content — not feed volume — and
per-batch wall does not trend up as the admitted corpus grows.

Feed: BATCHES files × ROWS_PER_BATCH vectors each; 90% of every batch
re-encodes the same BASE_VECS base vectors under fresh ids (the
duplicative regime a crawl replay produces), 10% are genuinely new.
Expected steady state: sigs ≈ BASE_VECS + 10%·feed, flags ≈ 90%·feed.

Prints one JSON line and writes it to GATE_SOAK_r11.json-style files
via the caller's redirection:

    python scripts/gate_soak.py [--workdir /tmp/via-gate-soak]
"""

from __future__ import annotations

import argparse
import json
import random
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCHES = 12
ROWS_PER_BATCH = 5000  # sized so the ~3 s fixed foreachBatch cost amortizes
BASE_VECS = 4000  # the 90% duplicative block re-encodes these
DIM = 64
RATE_TARGET = 1000.0  # 10x the reference's >=100 ev/s ingest target


def _base_vectors() -> list[list[float]]:
    rng = random.Random(11)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(DIM)] for _ in range(BASE_VECS)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/via-gate-soak")
    args = ap.parse_args()
    work = Path(args.workdir)
    if work.exists():
        shutil.rmtree(work)
    src = work / "src"
    src.mkdir(parents=True)
    store = str(work / "gate_store")

    from pyspark.sql import SparkSession

    from via_spark.session import configure
    from via_spark.streaming import pipeline

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("via-gate-soak")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    base = _base_vectors()
    rng = random.Random(13)
    n_new = ROWS_PER_BATCH - (ROWS_PER_BATCH * 9) // 10
    total = 0
    for b in range(BATCHES):
        rows = []
        for i in range((ROWS_PER_BATCH * 9) // 10):
            vid = 1_000_000 * (b + 1) + i
            rows.append({"vec_id": vid, "embedding": base[(b * 7 + i) % BASE_VECS]})
        for i in range(n_new):
            vid = 1_000_000 * (b + 1) + 900_000 + i
            rows.append(
                {
                    "vec_id": vid,
                    "embedding": [rng.uniform(-1.0, 1.0) for _ in range(DIM)],
                }
            )
        with open(src / f"b{b:03d}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        total += len(rows)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)  # one file = one micro-batch
        .json(str(src))
    )
    t0 = time.monotonic()
    q = pipeline.start_embedding_gate(
        spark, stream, store, str(work / "ckpt"), available_now=True
    )
    q.awaitTermination(1800)
    wall = time.monotonic() - t0
    batch_secs = [
        p["batchDuration"] / 1000.0
        for p in (
            json.loads(pr.json if hasattr(pr, "json") else pr)
            for pr in q.recentProgress
        )
        if p.get("numInputRows", 0) > 0
    ]

    sigs = spark.read.parquet(f"{store}/sigs").count()
    flagged = spark.read.parquet(f"{store}/flagged").select("vec_id").distinct().count()
    admitted = spark.read.parquet(f"{store}/admitted").count()
    # distinct content actually fed (exact copies share bytes)
    distinct_fed = (
        spark.read.schema("vec_id long, embedding array<float>")
        .json(str(src))
        .select("embedding")
        .distinct()
        .count()
    )

    head = batch_secs[: max(3, len(batch_secs) // 4)]
    tail = batch_secs[-max(3, len(batch_secs) // 4):]
    trend = (sum(tail) / len(tail)) / max(sum(head) / len(head), 1e-9)
    checks = {
        "state_bounded_by_distinct_content": sigs <= distinct_fed,
        "all_rows_decided": admitted + flagged == total,
        "dup_block_flagged": flagged >= (total * 8) // 10,
        "rate_ge_10x_target": total / wall >= RATE_TARGET,
        # growing corpus must not grow per-batch wall (dial + prefix
        # join keep it |batch| x occupancy); 1.5 allows trigger noise
        "batch_wall_flat": trend <= 1.5,
    }
    print(
        json.dumps(
            {
                "ok": all(checks.values()),
                "checks": checks,
                "batches": BATCHES,
                "rows_fed": total,
                "wall_s": round(wall, 1),
                "rows_per_s": round(total / wall, 1),
                "sigs_rows": sigs,
                "distinct_fed": distinct_fed,
                "flagged": flagged,
                "admitted": admitted,
                "batch_secs_head_mean": round(sum(head) / len(head), 2),
                "batch_secs_tail_mean": round(sum(tail) / len(tail), 2),
                "wall_trend_tail_over_head": round(trend, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
