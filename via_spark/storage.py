"""Bucketed-table storage: shuffle-free co-located joins.

SCALE.md's big-join story made concrete: persisting both sides of a
recurring join bucketed (and sorted) by the join key lets every
subsequent join read co-located buckets — NO Exchange in the plan, the
single biggest cost at 100 TB for fact-fact joins the optimizer cannot
broadcast. ``tests/test_storage.py`` asserts the Exchange-free plan.

This uses Spark's native catalog (``saveAsTable`` + ``bucketBy``); on a
cluster the same code targets the shared metastore. Bucket count is a
deployment parameter — pick so each bucket×partition fits executor
memory at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — planned
    without a shuffle on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "event_date",
    sort_col: str | None = None,
) -> dict:
    """Small-file compaction for a date-partitioned store (O-maintenance).

    Micro-batch ingest appends one file per trigger per day; thousands
    of tiny files destroy scan throughput (per-file open cost, tiny row
    groups, no effective min/max skipping). This rewrites the store so
    each partition value lands in one task → one file (optionally
    re-sorted so row-group stats sharpen range skipping again).

    The rewrite goes to a temp directory first, so the read plan feeding
    it never races its own overwrite and the live path never holds a
    partially-written state; the swap itself is two renames, so there IS
    a brief window with no live directory — run compaction when the
    store is quiescent (true atomic swap needs a table format /
    manifest, out of scope here). Stale tmp/old directories from a
    crashed prior run are cleaned up on entry, and a failed swap is
    rolled back. Returns {"files_before": n, "files_after": m,
    "rows": r}.

    Scale: cost is one shuffle of the compacted days; at 100 TB you'd
    run this per recent partition (a day just past its append horizon),
    not over the whole store — the path argument can point at a single
    ``event_date=...`` directory's parent scope accordingly.
    """
    import os
    import shutil

    def _count_files(p: str) -> int:
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    for stale in (tmp, old):  # leftovers from a crashed prior run
        if os.path.isdir(stale):
            shutil.rmtree(stale)

    before = _count_files(path)
    df = spark.read.parquet(path)
    rows = df.count()
    writer = df.repartition(partition_col)
    if sort_col:
        writer = writer.sortWithinPartitions(sort_col)
    writer.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll the live store back
        raise
    shutil.rmtree(old)
    return {"files_before": before, "files_after": _count_files(path), "rows": rows}


def drop_partitions_before(path: str, cutoff_date: str) -> list[str]:
    """Retention for date-partitioned stores (O3): delete whole
    ``event_date=YYYY-MM-DD`` partition directories older than the
    cutoff — the engine's equivalent of the reference dropping a daily
    collection. Returns the dropped partition names.

    Deleting directories (not rows) means retention cost is O(days
    dropped), independent of data volume — the property that makes
    100 TB retention tractable.
    """
    import os
    import shutil

    dropped = []
    if not os.path.isdir(path):
        return dropped
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("event_date="):
            continue
        day = entry.split("=", 1)[1]
        if day < cutoff_date:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(entry)
    return dropped
