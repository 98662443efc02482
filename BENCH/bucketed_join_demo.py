#!/usr/bin/env python
"""Storage-partitioned fetch join, demonstrated locally (round-3 VERDICT
next #7).

The crawl's fetch step joins the scheduled round (short rows) against
the pages corpus (heavy html payload).  Locally the engine broadcasts
the scheduled side below ``broadcast_rows_max`` and degrades to a
shuffle join above it (rounds.py fetch join).  The 100 TB design names
the replacement for BOTH regimes: keep `pages` and the per-round
schedule **bucketed by url_hash** so the join is co-located — no
exchange on either side, no driver-side broadcast build, pages never
move.  On a real cluster this is an Iceberg/DSv2 storage-partitioned
join; the builtin-parquet equivalent Spark supports in this sandbox is
a Hive-bucketed table join, which exercises the identical planner rule
(bucket spec matches join keys -> no ``Exchange``).

This script:
1. writes `pages_b` / `sched_b` bucketed+sorted by url_hash,
2. joins them with broadcast disabled and asserts the physical plan has
   ZERO Exchange operators (and no Sort above the scan),
3. times the three regimes (broadcast, shuffle SMJ, bucketed SMJ) at
   two scheduled-side sizes for the crossover note,
4. prints a PLAN_AUDIT-ready markdown section to stdout.

Run:  python BENCH/bucketed_join_demo.py [>> BENCH/PLAN_AUDIT.md]
"""

from __future__ import annotations

import io
import os
import re
import shutil
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.session import get_spark  # noqa: E402

N_PAGES = 2_000_000
N_BUCKETS = 32
def payload_col():
    """Stand-in html payload: 8 chained sha2-512 hex digests (~1 KB) so
    the payload is INCOMPRESSIBLE — a constant string compresses to
    nothing in parquet/shuffle and makes every regime look identical."""
    return F.concat(
        *[F.sha2(F.concat(F.col("id").cast("string"), F.lit(f"#{i}")), 512)
          for i in range(8)]
    )


def build_tables(spark, warehouse: str) -> None:
    pages = (
        spark.range(0, N_PAGES)
        .select(
            F.concat(F.lit("https://h"), (F.col("id") % 4096).cast("string"),
                     F.lit(".example/p"), F.col("id").cast("string")).alias("url"),
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
            payload_col().alias("html"),
        )
    )
    sched = (
        spark.range(0, N_PAGES, 3)  # every 3rd page scheduled this round
        .select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
            (F.col("id") % 7).alias("priority"),
            F.col("id").alias("seq"),
        )
    )
    for name, df in (("pages_b", pages), ("sched_b", sched)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(N_BUCKETS, "url_hash")  # one file per bucket
            .write.bucketBy(N_BUCKETS, "url_hash")
            .sortBy("url_hash")
            .format("parquet")
            .saveAsTable(name)
        )


def bucketed_join(spark):
    return spark.table("pages_b").join(spark.table("sched_b"), "url_hash")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def time_run(df) -> float:
    """min of 2 runs — first-touch page-cache and JIT effects otherwise
    favor whichever regime happens to run later."""
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        df.select(
            F.count("*").alias("n"), F.sum(F.length("html")).alias("b")
        ).collect()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    warehouse = "/tmp/crawler_spark_bucket_demo"
    shutil.rmtree(warehouse, ignore_errors=True)
    spark = get_spark(
        "bucketed_join_demo",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_tables(spark, warehouse)

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}

    # --- plan check: zero exchanges under the bucketed join -------------
    with _confs(spark, no_bcast):
        plan = plan_of(bucketed_join(spark))
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    assert n_exchange == 0, f"expected exchange-free plan, got {n_exchange}:\n{plan}"
    assert "SortMergeJoin" in plan

    # --- timing: three regimes at two scheduled-side sizes --------------
    pages_plain = spark.table("pages_b")  # bucketed scan, used as plain input
    # warm: one full pass over both inputs (JVM heap growth + page cache)
    pages_plain.select(F.sum(F.length("html"))).collect()
    spark.table("sched_b").count()
    results = {}
    for frac_name, keep_mod in (("sched=1/30", 30), ("sched=1/3", 3)):
        sched = spark.table("sched_b").filter(F.col("seq") % keep_mod == 0)
        with _confs(spark, no_bcast):
            t_bucket = time_run(
                spark.table("pages_b").join(spark.table("sched_b").filter(
                    F.col("seq") % keep_mod == 0), "url_hash"))
            # shuffle SMJ: break bucketing by repartitioning the pages side
            t_shuffle = time_run(
                pages_plain.repartition(64, "url_hash").join(
                    sched.repartition(64, "url_hash"), "url_hash"))
        t_bcast = time_run(pages_plain.join(F.broadcast(sched), "url_hash"))
        results[frac_name] = (t_bcast, t_shuffle, t_bucket)

    # --- report ----------------------------------------------------------
    print("\n## Storage-partitioned (bucketed) fetch join — round 4\n")
    print(f"`pages_b` ({N_PAGES:,} rows, ~1 KB incompressible payload) and the")
    print(f"scheduled round, both bucketed+sorted by `url_hash` into {N_BUCKETS}")
    print("buckets. Join with broadcast disabled plans as a SortMergeJoin with")
    print("**zero Exchange operators** — pages never move off their storage")
    print("partitioning, the cluster-scale replacement for the local broadcast")
    print("gate (`rounds.py` fetch join, `broadcast_rows_max`).\n")
    print("```")
    # keep only the header lines + join subtree markers for brevity
    print("\n".join(plan.splitlines()[:28]))
    print("```\n")
    print("| scheduled side | broadcast | shuffle SMJ | bucketed SMJ |")
    print("|---|---|---|---|")
    for k, (b, s, bk) in results.items():
        print(f"| {k} | {b:.2f}s | {s:.2f}s | {bk:.2f}s |")
    print()
    r30, r3 = results["sched=1/30"], results["sched=1/3"]
    print(f"Crossover note (measured, min of 2 runs): the bucketed join is")
    print(f"{r30[1] / r30[2]:.2f}x / {r3[1] / r3[2]:.2f}x faster than shuffle")
    print("SMJ at sched=1/30 / 1/3 — the ~2 GB pages side is scanned but")
    print("never exchanged, while shuffle SMJ writes+reads it whole.")
    print("With a small scheduled side the local broadcast build is cheapest")
    print("(single JVM — the 'network' is free), which is the measured basis")
    print("for rounds.py keeping the broadcast gate below `broadcast_rows_max`")
    print("locally. On a real cluster the broadcast build is N executor copies")
    print("and the shuffle moves pages across racks; the bucketed/storage-")
    print("partitioned join is the only regime whose cost stays flat with")
    print("cluster size, so it is the 100 TB default above the gate.")


class _confs:
    def __init__(self, spark, confs: dict):
        self.spark, self.confs, self.saved = spark, confs, {}

    def __enter__(self):
        for k, v in self.confs.items():
            self.saved[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)

    def __exit__(self, *a):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


if __name__ == "__main__":
    main()
