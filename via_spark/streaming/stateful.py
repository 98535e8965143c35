"""Custom stateful streaming operator: per-hash running statistics.

Demonstrates arbitrary stateful processing (``applyInPandasWithState``)
— the API a custom operator needs when windowed aggregation can't
express the state machine. The reference has exactly one stateful
concept (the suppression TTL cache, T6) which this engine models as a
rules table; this operator adds the genuinely-stateful capability a
log-intelligence pipeline grows next: a per-rhythm-hash RUNNING profile
(lifetime count, last-seen timestamp, exponentially-weighted rate)
maintained across micro-batches and usable as an always-current
baseline — the incremental version of the batch A2 statistics.

State shape per key: (total long, last_ts long, ewma double).
EWMA update per batch: ``ewma = alpha * batch_n + (1-alpha) * ewma``
with alpha pinned at 0.3 — deterministic given batch boundaries.

Scale posture (100 TB/day): state is one tiny tuple per distinct
rhythm hash (bounded by template cardinality, not volume); the Python
worker sees Arrow batches per key group; HDFS/RocksDB state-store
backends apply unchanged. For production add a state TTL
(GroupStateTimeout) so dead hashes age out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALPHA = 0.3
OUTPUT_SCHEMA = (
    "rhythm_hash string, batch_n long, total_n long, last_ts long, ewma double"
)
STATE_SCHEMA = "total long, last_ts long, ewma double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    batch_n = 0
    last_ts = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        if len(pdf):
            last_ts = max(last_ts, int(pdf["ts"].max()))
    if state.exists:
        total, prev_ts, ewma = state.get
    else:
        total, prev_ts, ewma = 0, 0, 0.0
    total += batch_n
    last_ts = max(last_ts, prev_ts)
    ewma = ALPHA * batch_n + (1 - ALPHA) * ewma
    state.update((total, last_ts, ewma))
    yield pd.DataFrame(
        [
            {
                "rhythm_hash": key[0],
                "batch_n": batch_n,
                "total_n": total,
                "last_ts": last_ts,
                "ewma": ewma,
            }
        ]
    )


def running_hash_stats(stream: DataFrame) -> DataFrame:
    """Streaming per-hash running profile (update output mode)."""
    return (
        stream.select("rhythm_hash", "ts")
        .groupBy("rhythm_hash")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
