"""PySpark-native realtime data-warehouse engine.

A from-scratch rebuild of the query semantics of
huxiaosir/flink-realtime-datawarehouse-v3 (a Flink 1.13 "gmall" realtime DW:
ODS -> DIM/DWD -> DWS layering over Kafka/Phoenix/ClickHouse) on idiomatic
PySpark: DataFrame/SQL + Catalyst for the batch-parity plane, Structured
Streaming (availableNow / applyInPandasWithState) for the streaming plane.

Layout
------
- ``session``   : pinned SparkSession builder (timezone, AQE, shuffle parts)
- ``sources``   : star-schema loaders + deterministic ODS synthesizers
                  (CDC ``topic_db`` envelope, nested ``topic_log`` events)
- ``functions`` : scalar helpers (dates, JSON, tokenizer)
- ``operators`` : reusable operator library (dedup D1-D4, CEP D5, tumbling
                  windows, config-driven DIM router, text dedup / similarity
                  search / text analysis / multimodal plumbing)
- ``plans``     : one module per reference pipeline (DWD filters/joins, DWS
                  windowed aggregations) as pure DataFrame -> DataFrame fns
- ``streaming`` : stream wrappers (availableNow parity, stateful variants)

Every pipeline is a pure function over DataFrames so the same code runs in
batch (DuckDB-oracle-checked) and under Structured Streaming.
"""

__version__ = "0.1.0"
