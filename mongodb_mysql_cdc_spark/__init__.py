"""mongodb_mysql_cdc_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``arashkhavari/mongodb-mysql-cdc`` (a MongoDB→MySQL change-data-capture
pipeline), re-expressed Spark-first:

- CDC snapshot + change-stream tail  → Structured Streaming + foreachBatch
  upsert (see ``streaming/``, ``sources/cdc.py``).
- BSON→relational transform          → declared StructType schemas, JSON
  escape hatch via from_json / get_json_object (``operators/relational.py``).
- Idempotent MySQL apply             → key-reconciled MERGE in foreachBatch
  over parquet state (``streaming/apply.py``).
- Plus the LLM-data-pipeline extension surface: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search, multimodal
  binary columns, text analysis (``operators/llm/``).

Design notes for 100 TB scale live in ``plans/`` and SCALE.md. The reference
tree at /root/reference was empty at survey time (see SURVEY.md §⚠️); the
semantics implemented here are the public, documented semantics of MongoDB
change streams, MySQL upsert sinks, and Debezium-style CDC envelopes.
"""

__version__ = "0.1.0"
