#!/usr/bin/env python
"""spark-submit job script — the north-rule deployment shape.

The target deployment is ``spark-submit --py-files crawler_spark.zip``
on a multi-executor cluster (BASELINE.json north_rule).  This script is
the submitted application: it imports ``crawler_spark`` from the
``--py-files`` archive (NOT from a checkout — the CI test runs it from
a working directory where the package is not importable), crawls a
fixture end-to-end through the public ``CrawlRun`` API, and prints one
``SUBMIT_RESULT`` JSON line with the document count, round count and an
order+text digest the caller can compare against the sequential oracle.

Usage::

    spark-submit --master local[8] --driver-memory 4g \
        --py-files crawler_spark.zip BENCH/submit_crawl.py \
        <fixture_profile> <state_dir>

On a real cluster the same invocation changes only ``--master`` (YARN /
k8s / standalone) and executor sizing flags; the job code is identical
because nothing in the engine assumes local mode.
"""

import hashlib
import json
import os
import sys

from pyspark.sql import SparkSession


def main() -> None:
    profile, state_dir = sys.argv[1], sys.argv[2]
    # No .master() here: spark-submit owns the master / deploy mode.
    spark = (
        SparkSession.builder.appName(f"crawler_spark_submit_{profile}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Imported AFTER the session exists, from the --py-files zip.
    from crawler_spark.fixtures import AS_OF, fixture_dir
    from crawler_spark.rounds import CrawlRun

    fix = fixture_dir(profile)
    run = CrawlRun(
        spark,
        state_dir=state_dir,
        pages_path=os.path.join(fix, "pages.parquet"),
        seeds_path=os.path.join(fix, "seeds.parquet"),
        robots_path=os.path.join(fix, "robots.parquet"),
        as_of=AS_OF,
    )
    stats = run.run(max_rounds=50)
    rows = (
        run.documents.read(spark)
        .orderBy("seq")
        .select("seq", "url", "text")
        .collect()
    )
    h = hashlib.md5()
    for r in rows:
        h.update(f"{r['seq']}|{r['url']}|".encode())
        h.update(r["text"].encode())
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "docs": len(rows),
                "rounds": len(stats),
                "order_text_md5": h.hexdigest(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
