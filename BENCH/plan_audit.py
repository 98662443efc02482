#!/usr/bin/env python
"""Physical-plan audit: `.explain("formatted")` for every registry query.

Writes BENCH/PLAN_AUDIT.md with, per query:
- the physical plan
- detected GOOD markers (WholeStageCodegen spans, PushedFilters,
  BroadcastHashJoin, partial aggregation) and RED flags (cartesian
  product, row-at-a-time Python UDF (BatchEvalPython), single-partition
  window without partitioning where data is large, full-column scans
  where the query projects few columns).

This is the 'iterate until it's the plan you'd want' loop made
repeatable: rerun after any operator change.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SKIP = {"crawl_mini"}  # multi-job driver loop, not one plan

GOOD = {
    "WholeStageCodegen": r"WholeStageCodegen",
    "PushedFilters": r"PushedFilters: \[[^\]]",
    "BroadcastHashJoin": r"BroadcastHashJoin",
    "partial_agg": r"HashAggregate.*partial",
    "ArrowEval(vectorized python)": r"ArrowEvalPython|MapInPandas|MapInArrow|PythonMapInArrow|FlatMapGroupsInPandas",
}
BAD = {
    "CartesianProduct(non-broadcast)": r"CartesianProduct",
    "Row-at-a-time PythonUDF": r"BatchEvalPython",
    "SortMergeJoin(check if broadcast-able)": r"SortMergeJoin",
}

# SMJs that ARE the designed scale shape (both sides corpus-sized, a
# broadcast would be wrong at 10^10 rows) — reported as a note, not a
# flag, with the justification inline so the exemption stays auditable.
JUSTIFIED_SMJ = {
    "redirect_resolve": (
        "pointer-doubling self-join: both sides are the corpus-sized "
        "pointer table, hash-partitioned on the jump key by design"
    ),
}


def aqe_skew_demo(spark) -> str:
    """Run a deliberately skewed sort-merge join under AQE and capture
    the FINAL adaptive plan showing the skew-split (``skew=true``) —
    ROADMAP #5 / VERDICT round-2 next #8.

    The shape is the crawl's hot-host case: one join key (a boilerplate
    host) holds half the fact rows.  Thresholds are lowered so the demo
    triggers at sandbox scale; at 100 TB the defaults (256 MB advisory,
    factor 5) fire on the same plan shape.  AQE decides from RUNTIME
    partition sizes, so the plan must be captured *after* execution —
    a static EXPLAIN never shows the split.

    Three pitfalls this demo codifies (each silently yields a skewless
    plan):

    1. ``df.write`` builds a NEW QueryExecution around the write
       command — ``df._jdf.queryExecution()`` afterwards is the
       *unexecuted* plan (``isFinalPlan=false``).  Execute via an
       action on the same frame (``collect()``) to read the final plan.
    2. Skew detection uses COMPRESSED map-output sizes.  A constant
       payload (``repeat('x', 64)``) compresses to KBs and the "hot"
       partition never crosses the threshold — the payload must be
       per-row-unique (sha2 here).
    3. Catalyst column-prunes the payload out of the shuffle if nothing
       downstream reads it, reducing the hot partition to its constant
       join key (which also compresses away).  The aggregate must
       consume the payload (``sum(length(payload))``).
    """
    from pyspark.sql import functions as F

    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    }.items():
        spark.conf.set(k, v)
    # fact side: 1M rows, half of them on the hot key 0, with an
    # incompressible (per-row-unique) payload so the hot partition's
    # compressed shuffle bytes actually trip the skew threshold
    fact = spark.range(0, 1_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(400)))
        .alias("host_key"),
        F.concat(
            F.sha2(F.col("id").cast("string"), 256),
            F.sha2((F.col("id") + 1).cast("string"), 256),
        ).alias("payload"),
    )
    dim = spark.range(0, 400).select(
        F.col("id").alias("host_key"), F.col("id").alias("robots_group")
    )
    # the agg must read payload or Catalyst prunes it out of the shuffle
    joined = (
        fact.join(dim, "host_key")
        .groupBy("robots_group")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("payload_bytes"),
        )
    )
    joined.collect()  # action on the SAME frame: its QE holds the final plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
    assert "skew=true" in plan, "AQE skew split did not trigger"
    keep = "\n".join(
        l for l in plan.splitlines()
        if "skew=true" in l or "AQEShuffleRead" in l or "SortMergeJoin" in l
        or "isFinalPlan" in l
    )
    return keep


def main() -> None:
    from crawler_spark import queries as Q
    from crawler_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    lines = ["# PLAN_AUDIT — physical plans of every registry query", ""]
    summary = []
    for name, fn in Q.QUERIES.items():
        if name in SKIP:
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        good = [k for k, p in GOOD.items() if re.search(p, plan)]
        bad = [k for k, p in BAD.items() if re.search(p, plan)]
        if name in JUSTIFIED_SMJ and "SortMergeJoin(check if broadcast-able)" in bad:
            bad.remove("SortMergeJoin(check if broadcast-able)")
            good.append(f"SMJ-by-design ({JUSTIFIED_SMJ[name]})")
        summary.append((name, good, bad))
        lines += [
            f"## {name}",
            f"- good: {', '.join(good) or '-'}",
            f"- flags: {', '.join(bad) or '-'}",
            "",
            "```",
            plan.strip()[:4000],
            "```",
            "",
        ]

    skew_plan = aqe_skew_demo(spark)
    lines += [
        "## AQE skew-join demonstration (runtime-final plan)",
        "",
        "A hot-key sort-merge join (half the fact rows on one key) run",
        "under AQE with sandbox-scale thresholds; the FINAL adaptive plan",
        "shows the skewed partition split (`skew=true`) — the runtime",
        "half of the engine's hot-host strategy (manual salting covers",
        "the semantic politeness partitioning; AQE covers plain joins).",
        "",
        "```",
        skew_plan,
        "```",
        "",
    ]

    head = ["| query | good markers | flags |", "|---|---|---|"]
    for name, good, bad in summary:
        head.append(f"| {name} | {', '.join(good) or '-'} | {', '.join(bad) or '-'} |")
    out = "\n".join(lines[:2] + head + [""] + lines[2:])
    with open(os.path.join(REPO, "BENCH", "PLAN_AUDIT.md"), "w") as f:
        f.write(out)
    print("wrote BENCH/PLAN_AUDIT.md;",
          sum(1 for _, _, b in summary if b), "queries flagged")


if __name__ == "__main__":
    main()
