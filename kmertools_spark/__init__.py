"""kmertools_spark — a PySpark-native feature-engineering engine with the
computational semantics of anuradhawick/kmertools, re-hosted as windowed,
point-in-time features over tables of multi-turn transcripts.

Layout:
  oracle/     pure-numpy ground-truth kernels (no Spark)
  functions/  vectorized pandas/Arrow UDF builders (the scalar layer)
  operators/  DataFrame -> DataFrame operators (sessionize, as-of join,
              rolling windows, dedup, similarity, skew helpers)
  sources/    input synthesis + IO helpers
  plans/      checkpointed backfill driver
  streaming/  Structured Streaming surface
"""

__version__ = "0.1.0"
