"""SQL catalog facade: the engine's tables as temp views for
``spark.sql``.

The engine is DataFrame-first, but every fixture table and both derived
stores register as session temp views so the full surface is reachable
from plain SQL — the path a BI tool, notebook user, or JDBC gateway
takes. Registration is metadata-only (no scan happens until a query
runs); tier1/tier2 resolve through the session store, so SQL users get
the same write-once/read-many scan the DataFrame API gets.

Example::

    from via_spark import sqlcat
    sqlcat.register_tables(spark, sf_dir)
    spark.sql("SELECT severity, count(*) FROM tier1 GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from via_spark import store
from via_spark.session import TABLES, load_table


def register_tables(
    spark: SparkSession, sf_dir: str, include_stores: bool = True
) -> list[str]:
    """Register every fixture table (and the derived tier1/tier2
    stores) as temp views; returns the view names."""
    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if include_stores:
        store.tier1(spark, sf_dir).createOrReplaceTempView("tier1")
        names.append("tier1")
        from via_spark.operators.forensic import TIER2_VARIANT

        store.tier2(spark, sf_dir, **TIER2_VARIANT).createOrReplaceTempView("tier2")
        names.append("tier2")
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot convenience: register views, run the SQL."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
