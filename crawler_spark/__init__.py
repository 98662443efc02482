"""crawler_spark — a PySpark-native distributed URL-frontier + fetch scheduler.

A from-scratch re-expression of the capabilities of GDPRxiv/crawler
(reference at /root/reference, cited per-module as ``file:line``) as an
idiomatic Spark engine:

- ``pages`` / ``frontier`` / ``seen`` / ``documents`` tables (parquet +
  manifest snapshots via :mod:`crawler_spark.tables`; drop-in Iceberg when
  the runtime jar is on the cluster),
- micro-batch crawl rounds (expand -> dedupe -> schedule -> fetch/extract
  -> append) in :mod:`crawler_spark.rounds`,
- sharded Bloom URL-seen pre-filter + exact anti-join in
  :mod:`crawler_spark.seen`,
- per-host politeness token buckets + robots gating inside salted
  per-host partitions in :mod:`crawler_spark.frontier`,
- vectorized Arrow/pandas-UDF fetch+extract in :mod:`crawler_spark.extract`,
- analytics + training-data-pipeline operators under
  :mod:`crawler_spark.functions`.

Everything is DataFrame-first: joins, windows and aggregations are
declared so Catalyst/AQE pick physical strategies; Python appears only in
Arrow-vectorized UDF stages (never per-row UDFs).
"""

__version__ = "0.1.0"
