"""Driver-mimicking Spark-vs-DuckDB comparison harness.

Stricter than the driver: instead of hashing, we normalize every value
and compare sorted row multisets, reporting first diffs — so any
driver-side hash mismatch is caught (and debuggable) here first.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the double — exact comparison; both engines must agree bit-for-bit
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_key_sorted(cols, rows):
    """Sort columns by name (driver behavior), normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark_df, con, sql, max_report=5):
    """Return (ok, message)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        _, sn = rows_key_sorted(s_cols, s_rows)
        _, dn = rows_key_sorted(d_cols, d_rows)
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:max_report]
            only_s = [r for r in sn if r not in set(dn)][:max_report]
            only_d = [r for r in dn if r not in set(sn)][:max_report]
            problems.append(
                f"values differ; first aligned diffs={diffs}\n only_spark={only_s}\n only_duck={only_d}"
            )
    if problems:
        return False, "; ".join(problems)
    return True, f"ok ({len(s_rows)} rows)"
