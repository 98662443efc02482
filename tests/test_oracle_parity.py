"""Predicts the driver's correctness gate: every queries() entry with an
oracle must match the DuckDB result exactly (row count, sorted-column
value multiset) on the driver's own testdata at sf0.001.

The comparison is intentionally strict — cells are canonicalized to
strings (floats via repr, so only bit-identical doubles pass) and the
row multisets must be equal.  If this passes, the driver's
order-insensitive value-hash at sf0.01 should too.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon(df) -> list[tuple]:
    """pandas DataFrame -> sorted list of stringified rows, column-sorted."""
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            return repr(v)
        return str(v)

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    spark_pdf = qfn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(entry_mod.oracle_sql()[name]).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a, b = canon(spark_pdf), canon(duck_pdf)
    assert len(a) == len(b), f"{name}: rowcount {len(a)} vs {len(b)}"
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diff}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 3


def test_all_queries_have_callable():
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs
    assert "crawl_mini" in qs  # rows-only entry exists
