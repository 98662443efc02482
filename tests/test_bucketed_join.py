"""The storage-partitioned fetch join (round-3 VERDICT next #7): tables
bucketed by url_hash join with ZERO Exchange operators — the 100 TB
replacement for both the local broadcast gate and the shuffle fallback
in rounds.py's fetch join.  BENCH/bucketed_join_demo.py measures the
same shape at 2M rows; this keeps the plan property pinned in CI."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark):
    pages = spark.range(0, 5000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("html"),
    )
    sched = spark.range(0, 5000, 3).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id").alias("seq"),
    )
    names = ("t_pages_bkt", "t_sched_bkt")
    for name, df in zip(names, (pages, sched)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(N_BUCKETS, "url_hash")
            .write.bucketBy(N_BUCKETS, "url_hash")
            .sortBy("url_hash")
            .format("parquet")
            .saveAsTable(name)
        )
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_fetch_join_has_no_exchange(spark, bucketed_tables):
    pages_t, sched_t = bucketed_tables
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(pages_t).join(spark.table(sched_t), "url_hash")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert not re.search(r"\bExchange\b", plan), plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # and it computes the right thing: every 3rd row matches
        assert joined.count() == len(range(0, 5000, 3))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
