"""Text embedding (F6): deterministic hashing-trick embedder + the
production pandas_udf interface.

Capability parity with the reference's dense embedding step
(``BAAI/bge-small-en-v1.5`` via fastembed,
``app/core/config.py:27``, ``app/services/qdrant_service.py:22-26,123``):
two implementations behind one interface (SURVEY.md §7.4 decision 5):

* ``sparse_embedding_rows`` — the deterministic fallback used by tests
  and oracles: a hashing-trick bag-of-tokens embedding. Each token maps
  to dimension ``conv(sha256(token)[:3], 16, 10) % 384`` with weight =
  term frequency. Exact integer weights ⇒ cosine math is
  oracle-checkable bit-for-bit.
* ``dense_embed_batches`` — the production path: an Arrow-batched
  ``mapInPandas`` stage that would host a real ONNX/sentence-transformer
  model; STUBBED here (the container has no model runtime) with a
  clearly-marked NotImplementedError and the same batch contract.

Scale posture (100 TB): the fallback embedder is explode → groupBy —
one shuffle keyed by (id, dim); scoring joins on ``dim`` only touch
non-zero entries (sparse dot), so cost follows token count, not the
384-dim dense width. The production path streams Arrow batches through
Python workers with bounded memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from via_spark.functions.text import tokens

EMBED_DIM = 384


def token_dim(t: Column, dim: int = EMBED_DIM) -> Column:
    """Deterministic hashing-trick dimension for one token:
    first 12 bits of sha256(token), mod ``dim``."""
    return (F.conv(F.substring(F.sha2(t, 256), 1, 3), 16, 10).cast("int") % dim)


def sparse_embedding_rows(df: DataFrame, id_cols: list[str], text_col: str,
                          dim: int = EMBED_DIM) -> DataFrame:
    """(ids…, text) → (ids…, dim, w) sparse embedding rows, w = tf."""
    toks = df.select(*id_cols, F.explode(tokens(F.col(text_col))).alias("_t"))
    return (
        toks.withColumn("dim", token_dim(F.col("_t"), dim))
        .groupBy(*id_cols, "dim")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def sparse_norms(rows: DataFrame, id_cols: list[str]) -> DataFrame:
    """Per-id squared L2 norm of the sparse vector (exact BIGINT)."""
    return rows.groupBy(*id_cols).agg(F.sum(F.col("w") * F.col("w")).alias("n2"))


def dense_embed_batches(batches: Iterator, model_name: str = "bge-small-en-v1.5"):
    """Production dense-embedding stage (STUB).

    Contract: each incoming pandas DataFrame has columns (id, text);
    each yielded frame has (id, embedding: list[float] of 384). A real
    deployment loads the ONNX model once per worker here. This
    container has no model runtime, so the stage raises — the
    deterministic ``sparse_embedding_rows`` path is the engine's
    testable embedder.
    """
    raise NotImplementedError(
        f"dense embedding ({model_name}) requires an ONNX/model runtime "
        "not present in this container; use sparse_embedding_rows"
    )
