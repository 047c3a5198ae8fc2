"""ODS-layer sources.

- ``tables``: star-schema parquet loaders (region nation customer supplier
  part orders lineitem events documents embeddings).
- ``dic``: the ``base_dic`` dictionary dimension (reference:
  RT/utils/MysqlUtil.java:10-35 — a MySQL JDBC lookup table; here a tiny
  inline broadcast dim).
- ``cdc``: deterministic Maxwell-style CDC envelope (``topic_db``) synthesized
  from the star tables (reference schema: RT/utils/MyKafkaUtil.java:128-137).
- ``logs``: deterministic nested app-log events (``topic_log``) synthesized
  from the ``events`` table (reference shape: RT/app/dwd/BaseLogApp.java:112-166).

Synthesis is pure SQL over the driver's parquet, mirrored 1:1 by DuckDB CTEs
in :mod:`..oracle` so every downstream pipeline is oracle-checkable.
"""
