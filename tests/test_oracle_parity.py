"""Runs every queries() entry against its oracle_sql() via DuckDB at
sf0.01 — the same check the verify driver performs, but with diff
reporting. Any failure here would be a CORRECTNESS failure in the round.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import compare, duck_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duck_con(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(name, spark, sf_oracle, con):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_oracle)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    df = QUERIES[name](spark, sf_oracle)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert rows is not None and len(rows) >= 0
    assert len(df.columns) > 0


def test_every_query_has_an_oracle():
    """Engine-wide invariant: no rows-only queries — every operator the
    driver sees is value-checked against DuckDB."""
    assert set(QUERIES.keys()) == set(ORACLES.keys())
    # exact, not a floor: a dropped query or oracle must fail loudly
    assert len(QUERIES) == len(ORACLES) == 288
