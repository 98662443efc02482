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
    "ArrowEval(vectorized python)": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
}
BAD = {
    "CartesianProduct(non-broadcast)": r"CartesianProduct",
    "Row-at-a-time PythonUDF": r"BatchEvalPython",
    "SortMergeJoin(check if broadcast-able)": r"SortMergeJoin",
}


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
