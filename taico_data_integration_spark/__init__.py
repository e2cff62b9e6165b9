"""taico_data_integration_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference ETL platform
(taico-tech/taico_data_integration, surveyed in /root/repo/SURVEY.md) as an
idiomatic Spark SQL + DataFrame engine: sources/sinks, dimension sync
(anti-join upsert / mirror sync), star-schema transforms, incremental
watermark merge, staging->production promotion with rollback, a declarative
data-quality check engine, and large-scale LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design principles (100 TB first):
- DataFrame/SQL only; no RDDs, no driver-side row loops.
- Declarative plans so Catalyst does pushdown/pruning/join planning.
- Broadcast hints for small dimensions; AQE on for skew/adaptive shuffle.
- Exact DECIMAL arithmetic for money aggregates (oracle hash parity),
  cast to DOUBLE only at the output edge.
"""

__version__ = "0.1.0"
