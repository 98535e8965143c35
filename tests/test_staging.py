"""Round-10 staged queries: same oracle-parity gate as the registered
surface (tests/test_oracle_parity.py), run from via_spark.staging —
implementation + oracle are proven NOW; only driver registration waits
for the r10 head slots (see via_spark/staging.py docstring).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from via_spark import staging
from tests.parity import compare, duck_con

STAGED = staging.staged_queries()
STAGED_ORACLES = staging.staged_oracle_sql()


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duck_con(sf_oracle)
    yield c
    c.close()


def test_staging_contract():
    """Every staged query has an oracle, and none shadows a registered
    query (the r10 splice must be additive)."""
    assert set(STAGED.keys()) == set(STAGED_ORACLES.keys())
    assert not set(STAGED.keys()) & set(entrymod.queries().keys())


@pytest.mark.parametrize("name", sorted(STAGED.keys()))
def test_staged_query_matches_oracle(name, spark, sf_oracle, con):
    df = STAGED[name](spark, sf_oracle)
    ok, msg = compare(df, con, STAGED_ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_quartiles_over_matches_python_model(spark):
    """Property check: pinned order-statistic quartiles vs a pure-Python
    model over a planted multiset with ties and singleton groups."""
    rows = [
        ("a", i, v)
        for i, v in enumerate([5, 1, 3, 3, 9, 7, 3, 2, 8, 4, 6, 3])
    ] + [("b", 100, 42)] + [("c", i + 200, v) for i, v in enumerate([10, 20])]
    df = spark.createDataFrame(rows, "event_type string, event_id long, v_fix long")
    from via_spark.operators.stats import quartiles_over

    got = {
        r["event_type"]: (r["n"], r["q1_fix"], r["q3_fix"])
        for r in quartiles_over(df, "event_type", "v_fix", "event_id").collect()
    }
    by_key: dict[str, list[int]] = {}
    for k, _, v in rows:
        by_key.setdefault(k, []).append(v)
    for k, vals in by_key.items():
        s = sorted(vals)
        n = len(s)
        q1 = s[max(1, (n + 1) // 4) - 1]
        q3 = s[min(n, 3 * (n + 1) // 4) - 1]
        assert got[k] == (n, q1, q3), k
