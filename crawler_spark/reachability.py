"""S7: reachability analysis — selector probes over stored page snapshots.

The reference colors a GDPR->DPA->source->label->xpath tree by probing
stored page sources with per-DPA xpath lists and propagating colors up
(``reachability_analysis_service/__init__.py:7-69``; probe lists in
``pygdpr/assets/dpa-reachability-info.json``): a probe is BLACK when the
xpath still matches at least one element, WHITE when the site layout has
drifted, and an inner node is BLACK only if its children are.

Here the probe list per authority is the extraction registry itself —
the selectors the engine depends on (listing item / title / date /
pagination) — evaluated against the stored seed-page snapshots with one
Arrow-batched pandas stage.  Output has one row per (authority, probe)
plus a ``__source__`` rollup row per authority (the propagated color).

Scale shape: seeds ⨝ pages is a broadcast join (seed list is tiny), the
probe evaluation is mapInPandas over the joined rows (html never
shuffles), and the rollup is a per-authority aggregation over
|authorities| x |probes| short rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import cfg_of
from .htmlparse import parse_html

#: registry keys probed per authority (label nodes of the tree)
PROBE_KEYS = (
    "listing_item_selector",
    "item_title_selector",
    "item_date_selector",
    "pagination_selector",
    "listing_container_selector",
)

REACH_OUT = T.StructType(
    [
        T.StructField("authority", T.StringType(), False),
        T.StructField("probe", T.StringType(), False),
        T.StructField("selector", T.StringType(), True),
        T.StructField("hits", T.IntegerType(), False),
        T.StructField("color", T.StringType(), False),
    ]
)


def probes_for(authority: str) -> list[tuple[str, str]]:
    cfg = cfg_of(authority)
    out = []
    for key in PROBE_KEYS:
        sel = cfg.get(key)
        if sel:
            out.append((key, sel))
    return out


def _probe_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            probes = probes_for(r.authority)
            if r.html is None:
                for key, sel in probes:
                    rows.append((r.authority, key, sel, 0, "white"))
                continue
            root = parse_html(bytes(r.html).decode("utf-8"))
            for key, sel in probes:
                # positional_p authorities probe the container only; the
                # per-item selectors of container modes are absent by
                # construction (probes_for skips missing keys)
                hits = len(root.select(sel))
                rows.append(
                    (r.authority, key, sel, hits, "black" if hits else "white")
                )
        yield pd.DataFrame(
            rows, columns=["authority", "probe", "selector", "hits", "color"]
        )


def reachability_report(pages: DataFrame, seeds: DataFrame) -> DataFrame:
    """(authority, probe, selector, hits, color) rows + per-authority
    ``__source__`` rollups (black iff every probe is black — the
    reference's propagate_color over label nodes)."""
    seed_pages = seeds.select("authority", "url").join(
        pages.select("url", "html"), "url", "left"
    )
    probe_rows = seed_pages.mapInPandas(_probe_batch, REACH_OUT)
    rollup = (
        probe_rows.groupBy("authority")
        .agg(
            F.min(F.col("hits")).alias("hits"),
            F.when(
                F.every(F.col("color") == "black"), F.lit("black")
            )
            .otherwise(F.lit("white"))
            .alias("color"),
        )
        .select(
            "authority",
            F.lit("__source__").alias("probe"),
            F.lit(None).cast("string").alias("selector"),
            "hits",
            "color",
        )
    )
    return probe_rows.unionByName(rollup)
