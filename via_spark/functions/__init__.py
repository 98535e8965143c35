"""Column-expression library (all JVM-native, whole-stage-codegen friendly)."""

from via_spark.functions.embed import (  # noqa: F401
    sparse_embedding_rows,
    sparse_norms,
    token_dim,
)
from via_spark.functions.simhash import (  # noqa: F401
    hamming_hex,
    simhash_hex,
    simhash_votes,
    votes_to_hex,
)
from via_spark.functions.text import (  # noqa: F401
    INT_RE,
    IPV4_RE,
    UUID_RE,
    rhythm_hash,
    severity_number,
    template,
    tokens,
)
from via_spark.functions.vector import (  # noqa: F401
    cosine,
    dot,
    hamming_similarity,
    l2_norm,
    pack_bits,
)
