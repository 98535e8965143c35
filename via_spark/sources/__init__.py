"""Source layer: every way data enters the engine.

Re-exports the readers/parsers so callers depend on one module path:

* fixture / warehouse tables  — ``load_table``
* OTel-JSON envelopes (batch) — ``OTEL_SCHEMA`` + ``otel_flatten``
* OTel-JSON stream            — ``read_otel_stream`` (file source;
  swap for Kafka by replacing this one function)
* BGL fixed-position lines    — ``BGL_RE`` + ``bgl_parse``
* format detection            — ``detect_schema`` (OTel → BGL → None)
"""

from via_spark.operators.schema_infer import (  # noqa: F401
    BGL_RE,
    OTEL_SCHEMA,
    bgl_parse,
    detect_schema,
    otel_flatten,
)
from via_spark.session import load_table  # noqa: F401
from via_spark.streaming.pipeline import read_otel_stream  # noqa: F401
