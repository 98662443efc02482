"""S7 reachability: registry selectors probed against stored seed-page
snapshots, colors propagated like the reference's tree coloring
(reachability_analysis_service/__init__.py:7-69)."""

from pyspark.sql import functions as F

from crawler_spark import schema as S
from crawler_spark.fixtures import BASE_AUTHORITIES, fixture_dir
from crawler_spark.reachability import reachability_report


def _load(spark):
    fix = fixture_dir("sf0.001")
    pages = spark.read.schema(S.PAGES).parquet(f"{fix}/pages.parquet")
    seeds = spark.read.schema(S.SEEDS).parquet(f"{fix}/seeds.parquet")
    return pages, seeds


def test_intact_fixture_is_all_black(spark):
    pages, seeds = _load(spark)
    rep = reachability_report(pages, seeds)
    rollups = {
        r["authority"]: r["color"]
        for r in rep.filter(F.col("probe") == "__source__").collect()
    }
    assert set(rollups) == set(BASE_AUTHORITIES)
    assert all(c == "black" for c in rollups.values()), rollups


def test_layout_drift_turns_probe_white(spark):
    pages, seeds = _load(spark)
    # simulate site drift: austria's seed page loses its listing table
    drifted = pages.withColumn(
        "html",
        F.when(
            F.col("url").contains("/austria/list?page=1"),
            F.lit("<html><body><div class='new-layout'></div></body></html>").cast(
                "binary"
            ),
        ).otherwise(F.col("html")),
    )
    rep = reachability_report(drifted, seeds)
    at = {
        r["probe"]: r["color"]
        for r in rep.filter(F.col("authority") == "austria").collect()
    }
    assert at["listing_item_selector"] == "white"
    assert at["__source__"] == "white"
    # other authorities unaffected
    others = rep.filter(
        (F.col("probe") == "__source__") & (F.col("authority") != "austria")
    )
    assert all(r["color"] == "black" for r in others.collect())


def test_missing_snapshot_is_white(spark):
    pages, seeds = _load(spark)
    gone = pages.filter(~F.col("url").contains("/romania/list?page=1"))
    rep = reachability_report(gone, seeds)
    ro = {
        r["probe"]: (r["color"], r["hits"])
        for r in rep.filter(F.col("authority") == "romania").collect()
    }
    assert all(c == "white" and h == 0 for c, h in ro.values())
