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


def _spread_bits(c):
    """Spread a 16-bit value's bits to even positions (Morton helper) —
    the classic shift-and-mask sequence, all JVM bitwise ops."""
    from pyspark.sql import functions as F

    c = c.bitwiseOR(F.shiftleft(c, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x3333333333333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return c


def morton2(a, b, a_min, a_max, b_min, b_max, bits: int = 16):
    """Z-order key of two numeric columns: quantize each to a
    ``bits``-bit grid over its observed range, interleave the bits.
    Rows close in BOTH dimensions get close keys, so sorting by the key
    co-locates 2-D neighborhoods."""
    from pyspark.sql import functions as F

    grid = (1 << bits) - 1

    def q(c, lo, hi):
        span = max(float(hi) - float(lo), 1e-12)
        return F.least(
            F.lit(grid),
            ((c.cast("double") - float(lo)) * grid / span).cast("long"),
        )

    return _spread_bits(q(a, a_min, a_max)).bitwiseOR(
        F.shiftleft(_spread_bits(q(b, b_min, b_max)), 1)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 1,
    block_size: int | None = None,
) -> None:
    """Write ``df`` Z-order-clustered on (col_a, col_b).

    Sorting by ONE column makes its row-group min/max stats selective
    and leaves the other column's stats useless; the Morton key makes
    BOTH selective at once, so a 2-D box predicate (user AND time-range)
    skips row groups on either dimension — the standard multi-dimension
    layout for 100 TB scans (Delta/Iceberg OPTIMIZE ZORDER does exactly
    this). Range-partition + sort by the key = global clustering with
    one shuffle. Column ranges come from one cheap min/max aggregation.
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    if lo_a is None or lo_b is None:  # empty input → empty output, no key
        df.write.mode("overwrite").parquet(path)
        return
    z = morton2(F.col(col_a), F.col(col_b), lo_a, hi_a, lo_b, hi_b)
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    w = out.write.mode("overwrite")
    if block_size:
        w = w.option("parquet.block.size", str(block_size))
    w.parquet(path)


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
