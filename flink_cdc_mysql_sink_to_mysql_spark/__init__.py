"""PySpark-native structured-streaming CDC/CEP engine.

A brand-new engine (NOT a Flink port) with the query and data-processing
capabilities of the reference ``ffffffcode/flink-cdc-mysql-sink-to-mysql``
(a Flink 1.13 / Flink-CDC 2.1 job set: MySQL-binlog + Mongo-oplog CDC →
per-event derivation → union → batched JDBC sink, plus a rule-compiled
cohort query), re-expressed Spark-first over multi-turn conversation
transcripts:

- keyed Debezium-shaped changelog on ``conv_id`` (``op/before/after``),
- vectorized event derivation (Column expressions / Arrow ``mapInPandas``),
- tumbling / sliding / session windows with event-time watermarks,
- stateful stream-stream join of user-turns to assistant/tool-turns,
- idempotent exactly-once MERGE upsert sink (bucketed parquet shim with
  Iceberg-like atomic manifest swap),
- rule → Column cohort compiler (exist / not-exist anti-join + HAVING),
- training-data ops: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), ANN similarity search, text analysis, multimodal plumbing.

Reference citations in docstrings use file:line into ``/root/reference/``.
"""

__version__ = "0.1.0"
