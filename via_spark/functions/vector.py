"""Vector scalar functions over ``array<float/double>`` columns.

Native higher-order functions (aggregate / zip_with / transform) —
JVM-evaluated, no UDFs. Capability parity with the reference's Qdrant
distance metrics: DOT (tier1, ``app/services/qdrant_service.py:51``),
COSINE (tier2, ``app/services/qdrant_service.py:79``), and the
binary-quantized Hamming tier (``app/services/qdrant_service.py:54-58``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays (double)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm
    (defines V3's zero-query-vector degenerate case deterministically)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def pack_bits(bits: Column | str) -> Column:
    """Pack an array of 64 {0,1} ints into one LongType bitset (LSB-first),
    mirroring the reference's 64-dim binary vector layout
    (``app/services/ingestion_service.py:39``) as a single word —
    the 'binary quantization, always-RAM' trick as a Spark column."""
    return F.aggregate(
        F.zip_with(
            _c(bits),
            F.sequence(F.lit(0), F.lit(63)),
            lambda b, i: F.shiftleft(b.cast("long"), i),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def hamming_similarity(a: Column | str, b: Column | str) -> Column:
    """64 - popcount(a XOR b) over two packed-bit longs (F13)."""
    return F.lit(64) - F.bit_count(_c(a).bitwiseXOR(_c(b)))
