"""Column-expression library (all JVM-native, whole-stage-codegen friendly)."""

from via_spark.functions.text import (  # noqa: F401
    UUID_RE,
    IPV4_RE,
    INT_RE,
    template,
    rhythm_hash,
    severity_number,
    tokens,
)
from via_spark.functions.vector import (  # noqa: F401
    dot,
    l2_norm,
    cosine,
    hamming_similarity,
    pack_bits,
)
