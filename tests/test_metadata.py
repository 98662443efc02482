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


def test_full_gdpr_tree_validation(spark):
    """Round-3 VERDICT next #2: the COMPLETE 99-article validation tree.
    citations_full's own synthetic probes exercise combos the old
    18-article subset got wrong: 30(2)(c) valid (article 30 was absent
    from the subset), 50's article-level letters a-d valid / e invalid,
    flat article 10 rejects any paragraph, 26 has exactly paragraphs
    1-3.  Blank doc text isolates the synthetic refs."""
    from crawler_spark import metadata

    # direct tree-row membership: the full structure, not the subset
    rows = set(metadata.gdpr_tree_rows())
    assert (30, 2, "c") in rows and (30, 2, "e") not in rows
    assert (50, -1, "a") in rows and (50, -1, "e") not in rows
    assert (50, 1, "-") not in rows          # art. 50 has no numbered pars
    assert not any(a == 10 and p != -1 for a, p, _ in rows)  # flat article
    assert (26, 3, "-") in rows and (26, 4, "-") not in rows
    assert (83, 2, "k") in rows and (99, 2, "-") in rows
    assert (2, 2, "d") in rows and (2, 2, "e") not in rows

    docs = spark.createDataFrame(
        [(d, "") for d in range(10)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["article"], r["paragraph"], r["letter"])
        for r in metadata.citations_full(docs).collect()
    }
    for d in range(10):
        assert (d, 30, 2, "c") in got                      # newly valid
        has50 = (d, 50, None, chr(97 + d % 5)) in got
        assert has50 == (d % 5 < 4), (d, "article-level letters a-d only")
        # flat article: bare cites of 10 are valid (other synthetic refs
        # produce them), but NO paragraph cite of 10 may survive
        assert not any(
            a == 10 and p is not None for dd, a, p, _l in got if dd == d
        )
        has26 = (d, 26, d % 4 + 1, None) in got
        assert has26 == (d % 4 < 3), (d, "art 26 has paragraphs 1-3")


def test_timeline_locale_months_gated_on_lang(spark):
    """Round-5: hr/pl/hu/nl month vocabularies (X7's tables) are wired
    into the lang-gated timeline forms.  'listopada' is October in hr
    but November in pl — the gate (dateparser's languages=[lc]) must
    resolve the SAME token differently per doc."""
    rows = [
        (0, "case opened 5 listopada 2021 formally", "hr"),
        (1, "case opened 5 listopada 2021 formally", "pl"),
        (2, "case opened 5 januari 2021 formally", "nl"),
        (3, "case opened 2021. janu text 5 augusztus 2021 done", "hu"),
        # en doc: locale tokens must NOT resolve without the lang gate
        (4, "case opened 5 listopada 2021 formally", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {}
    for r in metadata.timeline_full(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["date_str"])
    assert "05/10/2021" in got[0]  # hr: October
    assert "05/11/2021" in got[1]  # pl: November
    assert "05/01/2021" in got[2]  # nl: January
    assert "05/08/2021" in got[3]  # hu: August
    assert not {"05/10/2021", "05/11/2021"} & got.get(4, set())


def test_timeline_fixture_remaps_en_docs_to_extra_locales(spark):
    # the planted locale sentence must resolve for remapped docs: doc_id
    # 2001 is en, odd -> remapped (2001 div 2 = 1000; 1000 % 4 = 0 -> hr)
    df = spark.createDataFrame(
        [(2001, "body text", "en")], "doc_id long, text string, lang string"
    )
    aug = metadata.with_timeline_text(df).collect()[0]
    assert aug["lang"] == "hr"
    n = 2001 % 2000  # = 1 -> m=2, dd=2, y=2018
    assert " 2 " + metadata.TIMELINE_LOCALE_MONTHS["hr"][1] + " 2018" in aug["text"]
    out = {r["date_str"] for r in metadata.timeline_full(df).collect()}
    assert "02/02/2018" in out


def test_keywords_lemma_exceptions_match_wordnet_pos_n(spark):
    """Round-5: the irregular noun forms lemmatize through the WordNet
    noun.exc table; 'better'/'ran' stay identity because the reference
    calls lem.lemmatize(word) with the default pos='n'."""
    text = (
        "better ran children men women feet teeth geese mice "
        "criteria analyses ladies glasses cases"
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    grams = {r["gram"] for r in metadata.keywords_full(df, k=100).collect()}
    # exceptions applied
    for lemma in ("child", "man", "woman", "foot", "tooth", "goose",
                  "mouse", "criterion", "analysis"):
        assert lemma in grams, lemma
    for raw in ("children", "men", "women", "feet", "teeth", "geese",
                "mice", "criteria", "analyses"):
        assert raw not in grams, raw
    # pos='n' identity forms untouched
    assert "better" in grams and "ran" in grams
    # regular rules still apply: ies->y, -s stripped ('glasses'->'glasse'
    # is the documented suffix-rule stand-in divergence: WordNet's
    # ses->s rule needs the noun dictionary to validate candidates)
    assert "lady" in grams and "case" in grams and "glasse" in grams


def test_timeline_spec_faithful_forms(spark):
    """Round-5 A5: the forms mirror AbsoluteDateSpecification exactly —
    %b abbreviated months, comma-less month-first, and dashed
    month-name dates are ACCEPTED (day/month/year all present as
    tokens, absolute_date_specification.py:5-22,36-45), while
    ordinal-day forms dateparser parses are REJECTED ('3rd' is one
    token, so the bare day numeral is absent)."""
    rows = [
        (0, "issued on 3 jan 2021 formally", "en"),
        (1, "issued on jan 3 2021 formally", "en"),
        (2, "issued on 3-may-2021 formally", "en"),
        (3, "issued on 3-feb-2021 formally", "en"),
        (4, "issued on may 3 2021 formally", "en"),
        # negatives: ordinal day / missing components / wrong abbr
        (5, "issued on the 3rd of may, 2021 formally", "en"),
        (6, "issued on may 3rd, 2021 formally", "en"),
        (7, "issued in may 2021 generally", "en"),
        (8, "issued on 3 sept 2021 formally", "en"),  # token != %b
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {}
    for r in metadata.timeline_full(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["date_str"])
    # timeline_full augments with the planted fixture date too (all
    # year 2018 for these doc_ids) — assert membership of the 2021
    # probe dates only
    assert "03/01/2021" in got[0]
    assert "03/01/2021" in got[1]
    assert "03/05/2021" in got[2]
    assert "03/02/2021" in got[3]
    assert "03/05/2021" in got[4]
    for neg, would_be in ((5, "03/05/2021"), (6, "03/05/2021"),
                          (8, "03/09/2021")):
        assert would_be not in got.get(neg, set()), (neg, got.get(neg))
    assert not any(d.endswith("/2021") for d in got.get(7, set()))
