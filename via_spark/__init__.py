"""via_spark — a PySpark-native log-intelligence / analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system srimon12/VIA (a FastAPI + Qdrant two-tier log platform):

* Tier-1 streaming fingerprint store + rhythm (novelty / frequency)
  anomaly detection                        -> ``via_spark.operators.rhythm``
* Tier-1 -> Tier-2 anomaly promotion       -> ``via_spark.operators.promote``
* Tier-2 forensic search (filtered k-NN, grouped top-1, recommend,
  zero-vector ordering, triage)            -> ``via_spark.operators.forensic``
* Vector layer (cosine/dot/hamming, simhash, BM25, hybrid RRF)
                                           -> ``via_spark.operators.{vector,search}``
* Control loop (suppress / patch rules)    -> ``via_spark.operators.control``
* Schema inference (OTel JSON / BGL)       -> ``via_spark.operators.schema_infer``
  (reader surface re-exported at ``via_spark.sources``)
* Structured Streaming ingest pipeline     -> ``via_spark.streaming.pipeline``
* LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram / embedding-cosine), LSH ANN, text analysis, multimodal
  column plumbing                          -> ``via_spark.operators.{dedup,textstats,multimodal}``
* Reference-shaped API facade (14 endpoints) -> ``via_spark.api.VIAEngine``
* Plan introspection (pushdown/broadcast asserts) -> ``via_spark.plans``

Everything is expressed with the DataFrame API / Spark SQL so Catalyst
(pushdown, pruning, AQE, whole-stage codegen) does the heavy lifting;
Python UDFs are avoided in every hot path.
"""

__version__ = "0.1.0"
