"""data_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the ``mei-glow/data-lakehouse`` reference (a medallion
Bronze→Silver→Gold lakehouse; see SURVEY.md), re-expressed as idiomatic
PySpark: declarative DataFrame/SQL plans optimized by Catalyst, designed
for a 1000-executor cluster over ~100 TB, tested locally.

Subpackages
-----------
- ``session``    — SparkSession factory with scale-aware defaults.
- ``functions``  — scalar/semantic column functions (the reference's
                   derived-domain operators D1–D11, text/vector helpers).
- ``operators``  — silver transform, gold marts, dedup, similarity,
                   data-quality assertions.
- ``sources``    — readers/writers (CSV, Parquet tables, JDBC).
- ``plans``      — incremental high-watermark materializer.
- ``streaming``  — Structured Streaming surface (watermark + windows).
- ``multimodal`` — opaque binary columns + stubbed decode UDFs.
"""

__version__ = "0.1.0"
