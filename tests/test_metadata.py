"""Semantic tests for the metadata-extraction analytics (A2-A6, X8, X10)."""

import pytest

from crawler_spark import metadata


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "some filler words here"),
        (1, "more filler content words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_citations_extracts_article_and_paragraph(docs):
    out = {r["doc_id"]: r for r in metadata.citations(docs).collect()}
    # augmentation: article = doc_id % 99 + 1, paragraph = doc_id % 7 + 1
    assert out[0]["article"] == 1 and out[0]["paragraph"] == 1
    assert out[1]["article"] == 2 and out[1]["paragraph"] == 2


def test_citation_count_nonzero(docs):
    out = {r["doc_id"]: r["n_citations"] for r in metadata.citation_count(docs).collect()}
    assert out[0] == 1 and out[1] == 1  # one 'gdpr' token in the tail


def test_monetary_and_timeline(docs):
    pen = {r["doc_id"]: r["amount"] for r in metadata.monetary_penalties(docs).collect()}
    assert pen[0] == 0 * 137 % 900000 + 1000
    assert pen[1] == 1 * 137 % 900000 + 1000
    tl = {r["doc_id"]: r["event_date"] for r in metadata.timeline(docs).collect()}
    assert tl[0] == "2018-05-25"  # doc 0: +0 days


def test_join_lines_rules(spark):
    df = spark.createDataFrame(
        [
            # line 1 lacks terminal punct, line 2 starts lowercase -> join with ' '
            (0, "the decision was\ntaken by the board."),
            # line 1 ends with '.', stays broken
            (1, "First sentence.\nsecond line"),
            # line 2 starts uppercase -> stays broken
            (2, "no punct here\nBut uppercase next"),
            (3, "single line only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["joined_text"] for r in metadata.join_lines(df).collect()}
    assert out[0] == "the decision was taken by the board."
    assert out[1] == "First sentence.\nsecond line"
    assert out[2] == "no punct here\nBut uppercase next"
    assert out[3] == "single line only"


def test_doc_keys_deterministic_and_wellformed(docs):
    k1 = {r["doc_id"]: r["doc_key"] for r in metadata.doc_keys(docs).collect()}
    k2 = {r["doc_id"]: r["doc_key"] for r in metadata.doc_keys(docs).collect()}
    assert k1 == k2
    for key in k1.values():
        assert key.startswith("K ") and len(key) == 6
        assert all(c in metadata.DOC_KEY_ALPHABET for c in key[2:])


def test_keywords_topk_ranks_by_frequency(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a b c d")], "doc_id long, text string"
    )
    out = sorted(
        metadata.keywords_topk(df, n=2, k=3).collect(), key=lambda r: r["rnk"]
    )
    assert out[0]["gram"] == "a b" and out[0]["n_occ"] == 3
    assert out[1]["gram"] == "b a" and out[1]["n_occ"] == 2
