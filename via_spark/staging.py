"""Staging registry — fully-built queries awaiting driver head slots.

Workflow (the r9→r10 pattern, kept for future rounds): new operators
land here first — implementation, DuckDB oracle, and parity tests all
DONE (tests/test_staging.py runs the same compare harness as
test_oracle_parity at sf0.01) — then, at the START of the next round,
``scripts/splice_staging.py`` appends them to the TAIL of
``__spark_entry__.queries()`` / ``oracle_sql()``, bumps the parity
count pin, and DRAINS this registry (the module stays importable; the
staged parity tests become no-ops while the model/planted/plan tests
keep running against the cores). The head reorder is a separate,
rotation-driven step: ``python -m via_spark.rotation`` after committing
the new round's driver artifacts, then move the suggested 50 names up.

Round-10 state: the 30 r9-staged queries were spliced into the
registered surface (258 total) and sit in the r10 head; the registry is
empty until the next staging batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Spliced into __spark_entry__ at the r10 head — registry drained."""
    return {}


def staged_oracle_sql() -> dict[str, str]:
    """Spliced into __spark_entry__ at the r10 head — registry drained."""
    return {}
