"""PySpark-native CDC-to-lakehouse engine.

A from-scratch re-expression of the capabilities of
memiiso/debezium-server-iceberg (reference studied read-only at
/root/reference) on idiomatic PySpark:

- write path  : Structured Streaming / batch ``foreachBatch`` pipeline that
  parses Debezium-envelope CDC events, infers schemas, dedups per key, and
  commits append or copy-on-write MERGE upserts into an ACID parquet table
  format (``lakehouse``).
- read path   : plain Spark SQL / DataFrame over the produced tables
  (mirroring the reference's own Spark-SQL-based verification,
  BaseSparkTest.java:33-201).
- extensions  : large-scale training-data operators (dedup families,
  similarity search, text analysis, multimodal plumbing) in ``functions``.

Nothing here is a translation of the reference's Java classes; SURVEY.md maps
each reference behavior (file:line) to the Spark construct used here.
"""

__version__ = "0.1.0"
