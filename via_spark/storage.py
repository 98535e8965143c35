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
