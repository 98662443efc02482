"""Metadata-extraction analytics (SURVEY.md §2.5) as Spark built-ins.

Re-expresses the reference's per-document metadata services — citations
(A2, ``pygdpr/services/metadata/citations_metadata_service/__init__.py:11-191``),
keywords (A4, ``.../keywords_metadata_service/__init__.py:14-35``),
timeline (A5, ``.../timeline_metadata_service/__init__.py:8-41``),
monetary penalties (A6, ``.../monetary_penalties_metadata_service/
__init__.py:6-79``), line re-join (X8, ``pygdpr/services/
join_lines_pdf_to_text_service.py:3-69``) and the push-key generator
(X10, ``pygdpr/services/document_key_service.py:5-27``) — as
set-oriented DataFrame transforms.  The reference's nltk/dateparser/
price_parser leaves are replaced by deterministic regex/arithmetic
equivalents so every operator has a cross-engine DuckDB oracle; the
extraction *dataflow* (per-sentence explode -> match -> struct rows ->
re-aggregate) is the part that matters at 100 TB and is identical.

All regexes are chosen to parse identically under Java regex (Spark)
and RE2 (DuckDB): no backrefs, no lookaround.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# A2: "article <n>" optionally "(<par>)" — nearest-article attribution is
# the reference's core trick; flat matches keep the same row shape.
CITE_RE = "article ([0-9]{1,3})(\\\\(([0-9]{1,3})\\\\))?"
# A5: absolute ISO dates only (the reference keeps only day+month+year
# matches — absolute_date_specification.py:35-46)
DATE_RE = "[0-9]{4}-[0-9]{2}-[0-9]{2}"
# A6: currency amounts "EUR 1234" / "1234 EUR"
MONEY_RE = "EUR ([0-9]+)"


def with_citation_text(docs: DataFrame) -> DataFrame:
    """Deterministic legal-text augmentation for the synthetic corpus.

    The driver's ``documents`` fixture is word-soup with no legal
    references, so every doc gets a deterministic, doc_id-derived legal
    tail (same arithmetic in the DuckDB oracle) — the extraction
    operators then have real matches to find.
    """
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" article "),
            (F.col("doc_id") % 99 + 1).cast("string"),
            F.lit("("),
            (F.col("doc_id") % 7 + 1).cast("string"),
            F.lit(") GDPR was infringed on "),
            F.date_format(
                F.date_add(F.lit("2018-05-25").cast("date"), (F.col("doc_id") % 2000).cast("int")),
                "yyyy-MM-dd",
            ),
            F.lit(" and a fine of EUR "),
            (F.col("doc_id") * 137 % 900000 + 1000).cast("string"),
            F.lit(" was imposed."),
        ),
    )


#: the same augmentation as ANSI SQL (DuckDB oracle twin)
DUCK_CITATION_TEXT = (
    "text || ' article ' || cast(doc_id % 99 + 1 as varchar)"
    " || '(' || cast(doc_id % 7 + 1 as varchar) || ') GDPR was infringed on '"
    " || strftime(cast('2018-05-25' as date) + to_days(cast(doc_id % 2000 as int)), '%Y-%m-%d')"
    " || ' and a fine of EUR ' || cast(doc_id * 137 % 900000 + 1000 as varchar)"
    " || ' was imposed.'"
)


def citations(docs: DataFrame) -> DataFrame:
    """A2: GDPR article references -> (doc_id, article:int, paragraph:int).

    explode(regexp_extract_all) — the per-sentence scan stays in codegen;
    validation against the article tree would be a broadcast-join on the
    article dimension (tree flattened to rows).
    """
    d = with_citation_text(docs)
    return (
        d.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(text, '{CITE_RE}', 0)")
            ).alias("m"),
        )
        .select(
            "doc_id",
            F.regexp_extract("m", "article ([0-9]{1,3})", 1)
            .cast("int")
            .alias("article"),
            F.nullif(
                F.regexp_extract("m", "\\(([0-9]{1,3})\\)", 1), F.lit("")
            )
            .cast("int")
            .alias("paragraph"),
        )
    )


# ---------------------------------------------------------------------------
# A2 full semantics: sentence gate -> nearest-article refs -> validation
# tree -> chapter/section attach
# ---------------------------------------------------------------------------

#: COMPLETE GDPR article validation tree: article -> {paragraph ->
#: letters}.  The structure of Regulation (EU) 2016/679 is public
#: knowledge (its published text); the reference consumes the same
#: structure from ``pygdpr/assets/gdpr-article-validation-tree.json``
#: at ``valid_gdpr_article_ref_specification.py:4-38``.  Semantics
#: mirrored exactly: a bare article 1-99 is always valid; (art, par) is
#: valid iff par is a key under art; (art, par, let) iff let is a key
#: under (art, par).  Articles whose JSON value is flat ``true`` (10,
#: 16, 19, 29, 31, 44, 48, 59, 63, 67, 86, 87, 95, 96, 98 — single
#: unnumbered provisions) have NO entry here, so any paragraph cite of
#: them is invalid (the reference would raise AttributeError on
#: ``True.keys()`` for those; the engine rejects instead of crashing).
#: Article 50's lettered points hang directly off the article — encoded
#: under the ``-1`` (no-paragraph) sentinel key, matching the
#: reference's ``let in validation_tree[art].keys()`` branch.
GDPR_TREE: dict[int, dict[int, str]] = {
    1: {1: "", 2: "", 3: ""},
    2: {1: "", 2: "abcd", 3: "", 4: ""},
    3: {1: "", 2: "ab", 3: ""},
    4: {1: "", 2: "", 3: "", 4: "", 5: "", 6: "", 7: "", 8: "", 9: "", 10: "", 11: "", 12: "", 13: "", 14: "", 15: "", 16: "ab", 17: "", 18: "", 19: "", 20: "", 21: "", 22: "abc", 23: "ab", 24: "", 25: "", 26: ""},
    5: {1: "abcdef", 2: ""},
    6: {1: "abcdef", 2: "", 3: "ab", 4: "abcde"},
    7: {1: "", 2: "", 3: "", 4: ""},
    8: {1: "", 2: "", 3: ""},
    9: {1: "", 2: "abcdefghij", 3: "", 4: ""},
    11: {1: "", 2: ""},
    12: {1: "", 2: "", 3: "", 4: "", 5: "ab", 6: "", 7: "", 8: ""},
    13: {1: "abcdef", 2: "abcdef", 3: "", 4: ""},
    14: {1: "abcdef", 2: "abcdefg", 3: "abc", 4: "", 5: "abcd"},
    15: {1: "abcdefgh", 2: "", 3: "", 4: ""},
    17: {1: "abcdef", 2: "", 3: "abcde"},
    18: {1: "abcd", 2: "", 3: ""},
    20: {1: "ab", 2: "", 3: "", 4: ""},
    21: {1: "", 2: "", 3: "", 4: "", 5: "", 6: ""},
    22: {1: "", 2: "abc", 3: "", 4: ""},
    23: {1: "abcdefghij", 2: "abcdefgh"},
    24: {1: "", 2: "", 3: ""},
    25: {1: "", 2: "", 3: ""},
    26: {1: "", 2: "", 3: ""},
    27: {1: "", 2: "ab", 3: "", 4: "", 5: ""},
    28: {1: "", 2: "", 3: "abcdefgh", 4: "", 5: "", 6: "", 7: "", 8: "", 9: "", 10: ""},
    30: {1: "abcdefg", 2: "abcd", 3: "", 4: "", 5: ""},
    32: {1: "abcd", 2: "", 3: "", 4: ""},
    33: {1: "", 2: "", 3: "abcd", 4: "", 5: ""},
    34: {1: "", 2: "", 3: "abc", 4: ""},
    35: {1: "", 2: "", 3: "abc", 4: "", 5: "", 6: "", 7: "abcd", 8: "", 9: "", 10: "", 11: ""},
    36: {1: "", 2: "", 3: "abcdef", 4: "", 5: ""},
    37: {1: "abc", 2: "", 3: "", 4: "", 5: "", 6: "", 7: ""},
    38: {1: "", 2: "", 3: "", 4: "", 5: "", 6: ""},
    39: {1: "abcde", 2: ""},
    40: {1: "", 2: "abcdefghijk", 3: "", 4: "", 5: "", 6: "", 7: "", 8: "", 9: "", 10: "", 11: ""},
    41: {1: "", 2: "abcd", 3: "", 4: "", 5: "", 6: ""},
    42: {1: "", 2: "", 3: "", 4: "", 5: "", 6: "", 7: "", 8: ""},
    43: {1: "ab", 2: "abcde", 3: "", 4: "", 5: "", 6: "", 7: "", 8: "", 9: ""},
    45: {1: "", 2: "abc", 3: "", 4: "", 5: "", 6: "", 7: "", 8: "", 9: ""},
    46: {1: "", 2: "abcdef", 3: "ab", 4: "", 5: ""},
    47: {1: "abc", 2: "abcdefghijklmn", 3: ""},
    49: {1: "abcdefg", 2: "", 3: "", 4: "", 5: "", 6: ""},
    50: {-1: "abcd"},
    51: {1: "", 2: "", 3: "", 4: ""},
    52: {1: "", 2: "", 3: "", 4: "", 5: "", 6: ""},
    53: {1: "", 2: "", 3: "", 4: ""},
    54: {1: "abcdef", 2: ""},
    55: {1: "", 2: "", 3: ""},
    56: {1: "", 2: "", 3: "", 4: "", 5: "", 6: ""},
    57: {1: "abcdefghijklmnopqrstuv", 2: "", 3: "", 4: ""},
    58: {1: "abcdef", 2: "abcdefghij", 3: "abcdefghij", 4: "", 5: "", 6: ""},
    60: {1: "", 2: "", 3: "", 4: "", 5: "", 6: "", 7: "", 8: "", 9: "", 10: "", 11: "", 12: ""},
    61: {1: "", 2: "", 3: "", 4: "ab", 5: "", 6: "", 7: "", 8: "", 9: ""},
    62: {1: "", 2: "", 3: "", 4: "", 5: "", 6: "", 7: ""},
    64: {1: "abcdef", 2: "", 3: "", 4: "", 5: "ab", 6: "", 7: "", 8: ""},
    65: {1: "abc", 2: "", 3: "", 4: "", 5: "", 6: ""},
    66: {1: "", 2: "", 3: "", 4: ""},
    68: {1: "", 2: "", 3: "", 4: "", 5: "", 6: ""},
    69: {1: "", 2: ""},
    70: {1: "abcdefghijklmnopqrstuvwxy", 2: "", 3: "", 4: ""},
    71: {1: "", 2: ""},
    72: {1: "", 2: ""},
    73: {1: "", 2: ""},
    74: {1: "abc", 2: ""},
    75: {1: "", 2: "", 3: "", 4: "", 5: "", 6: "abcdefg"},
    76: {1: "", 2: ""},
    77: {1: "", 2: ""},
    78: {1: "", 2: "", 3: "", 4: ""},
    79: {1: "", 2: ""},
    80: {1: "", 2: ""},
    81: {1: "", 2: "", 3: ""},
    82: {1: "", 2: "", 3: "", 4: "", 5: "", 6: ""},
    83: {1: "", 2: "abcdefghijk", 3: "", 4: "abc", 5: "abcde", 6: "", 7: "", 8: "", 9: ""},
    84: {1: "", 2: ""},
    85: {1: "", 2: "", 3: ""},
    88: {1: "", 2: "", 3: ""},
    89: {1: "", 2: "", 3: "", 4: ""},
    90: {1: "", 2: ""},
    91: {1: "", 2: ""},
    92: {1: "", 2: "", 3: "", 4: "", 5: ""},
    93: {1: "", 2: "", 3: ""},
    94: {1: "", 2: ""},
    97: {1: "", 2: "ab", 3: "", 4: "", 5: ""},
    99: {1: "", 2: ""},
}

#: Chapter/section ranges — gdpr_chapter_section_service.py:1-29 (facts
#: of the regulation's structure).
GDPR_CHAPTERS: list[tuple[int, int | None, int, int]] = [
    (1, None, 1, 4), (2, None, 5, 11),
    (3, 1, 12, 12), (3, 2, 13, 15), (3, 3, 16, 20), (3, 4, 21, 22), (3, 5, 23, 23),
    (4, 1, 24, 31), (4, 2, 32, 34), (4, 3, 35, 36), (4, 4, 37, 39), (4, 5, 40, 43),
    (5, None, 44, 50), (6, 1, 51, 54), (6, 2, 55, 59),
    (7, 1, 60, 62), (7, 2, 63, 67), (7, 3, 68, 76),
    (8, None, 77, 84), (9, None, 85, 91), (10, None, 92, 93), (11, None, 94, 99),
]


def gdpr_tree_rows() -> list[tuple[int, int, str]]:
    """Validation tree flattened to (article, par|-1, letter|'-') rows —
    the broadcast-join dimension (null levels coalesced to sentinels so
    the join is a plain equi-join on both engines).  The ``-1``
    paragraph key carries article-level letters (art. 50's points):
    those emit (art, -1, letter) rows only — the bare (art, -1, '-')
    row already comes from the 1-99 range."""
    rows = [(a, -1, "-") for a in range(1, 100)]
    for art, pars in GDPR_TREE.items():
        for par, letters in pars.items():
            if par != -1:
                rows.append((art, par, "-"))
            rows.extend((art, par, l) for l in letters)
    return rows


#: ref pattern: article N [(par)] [(let)] — groups 1/3/5.  Java regex and
#: RE2 parse it identically (no lookaround, no backrefs).
CITE_FULL_RE = "[Aa]rticle ([0-9]{1,3})(\\\\(([0-9]{1,2})\\\\))?(\\\\(([a-z])\\\\))?"

#: one reference item: N [(par)] [(let)]
_ITEM = "[0-9]{1,3}(\\\\([0-9]{1,2}\\\\))?(\\\\([a-z]\\\\))?"
#: a reference SPAN: 'Article(s)' followed by a connective list of items
#: — "Articles 5 and 6(1)(a)" yields TWO refs, the dangling number
#: attributed to the nearest preceding article keyword exactly like the
#: reference's token walk (citations_metadata_service/__init__.py:93-146).
CITE_SPAN_RE = f"[Aa]rticles? {_ITEM}((,| and| or) {_ITEM})*"
CITE_ITEM_RE = _ITEM


def with_citation_text_full(docs: DataFrame) -> DataFrame:
    """Augmentation for the full A2 semantics: one sentence with a
    legal-basis marker (gate passes) holding two refs — one with
    paragraph+letter (validity depends on the tree) and one bare valid
    article — plus one GATED-OUT sentence (no gdpr/2016/679 marker).
    Same arithmetic in the DuckDB oracle."""
    a1 = (F.col("doc_id") % 120 + 1).cast("string")
    p1 = (F.col("doc_id") % 9 + 1).cast("string")
    l1 = F.expr("chr(97 + cast(doc_id % 8 as int))")
    a2 = (F.col("doc_id") % 99 + 1).cast("string")
    a3 = (F.col("doc_id") % 50 + 1).cast("string")
    # split-reference sentence: "Articles B1 and B2(p)(l)" — the bare B1
    # must be attributed as its own article (nearest-article rule)
    b1 = (F.col("doc_id") % 21 + 1).cast("string")
    b2 = (F.col("doc_id") * 7 % 120 + 1).cast("string")
    p2 = (F.col("doc_id") % 11 + 1).cast("string")
    l2 = F.expr("chr(97 + cast(doc_id % 6 as int))")
    # full-tree probes (round-3 VERDICT next #2): refs whose validity
    # the OLD 18-article subset got wrong or never saw — 30(2)(c) valid
    # (was rejected), 50(a..d) valid article-level letters / 50(e)
    # invalid, 10(p) always invalid (flat article), 26(4) invalid while
    # 26(1..3) valid
    l50 = F.expr("chr(97 + cast(doc_id % 5 as int))")
    p10 = (F.col("doc_id") % 3 + 1).cast("string")
    p26 = (F.col("doc_id") % 4 + 1).cast("string")
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(". Article "), a1, F.lit("("), p1, F.lit(")("), l1,
            F.lit(") and Article "), a2,
            F.lit(" of Regulation 2016/679 were infringed"),
            F.lit(". Article "), a3, F.lit("(2) is discussed elsewhere"),
            F.lit(". Articles "), b1, F.lit(" and "), b2,
            F.lit("("), p2, F.lit(")("), l2,
            F.lit(") under the GDPR framework apply"),
            F.lit(". Article 30(2)(c) and Article 50("), l50,
            F.lit(") and Article 10("), p10,
            F.lit(") and Article 26("), p26,
            F.lit(") are assessed under the GDPR."),
        ),
    )


DUCK_CITATION_FULL_TEXT = (
    "text || '. Article ' || cast(doc_id % 120 + 1 as varchar)"
    " || '(' || cast(doc_id % 9 + 1 as varchar) || ')('"
    " || chr(97 + cast(doc_id % 8 as int)) || ') and Article '"
    " || cast(doc_id % 99 + 1 as varchar)"
    " || ' of Regulation 2016/679 were infringed'"
    " || '. Article ' || cast(doc_id % 50 + 1 as varchar)"
    " || '(2) is discussed elsewhere'"
    " || '. Articles ' || cast(doc_id % 21 + 1 as varchar)"
    " || ' and ' || cast(doc_id * 7 % 120 + 1 as varchar)"
    " || '(' || cast(doc_id % 11 + 1 as varchar) || ')('"
    " || chr(97 + cast(doc_id % 6 as int))"
    " || ') under the GDPR framework apply'"
    " || '. Article 30(2)(c) and Article 50('"
    " || chr(97 + cast(doc_id % 5 as int))"
    " || ') and Article 10(' || cast(doc_id % 3 + 1 as varchar)"
    " || ') and Article 26(' || cast(doc_id % 4 + 1 as varchar)"
    " || ') are assessed under the GDPR.'"
)


def citations_full(docs: DataFrame) -> DataFrame:
    """A2 with the reference's full structure
    (citations_metadata_service/__init__.py:38-191):

    1. sentence scan — only sentences passing the stem gate ('articl',
       the Porter stem of article/articles, :44-50) AND naming the
       regulation ('2016/679' / 'gdpr') yield refs (:51-67);
    2. reference SPANS — 'Article(s)' followed by a connective list —
       are extracted first, then each item inside a span becomes its own
       ref: "Articles 5 and 6(1)(a)" yields (5) and (6,1,a), the
       dangling number attributed to the nearest preceding article
       keyword exactly like the reference's token walk (:93-146);
    3. validation-tree **broadcast join**
       (valid_gdpr_article_ref_specification.py:4-38);
    4. chapter/section attach by article-range broadcast join
       (gdpr_chapter_section_service.py:1-29).

    Output: (doc_id, article, paragraph, letter, chapter, section,
    n_refs) — one row per distinct valid ref per doc with its
    occurrence count.
    """
    spark = docs.sparkSession
    tree = spark.createDataFrame(
        gdpr_tree_rows(), "article int, par0 int, let0 string"
    )
    chap = spark.createDataFrame(
        [
            (c, s, lo, hi)
            for c, s, lo, hi in GDPR_CHAPTERS
        ],
        "chapter int, section int, min_art int, max_art int",
    )
    d = with_citation_text_full(docs)
    sent = d.select(
        "doc_id",
        F.explode(F.expr("split(text, '[.!?] ')")).alias("sent"),
    ).filter(
        F.lower(F.col("sent")).contains("articl")  # Porter-stem gate
        & (
            F.col("sent").contains("2016/679")
            | F.lower(F.col("sent")).contains("gdpr")
        )
    )
    spans = sent.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(sent, '{CITE_SPAN_RE}', 0)")
        ).alias("span"),
    )
    refs = spans.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(span, '{CITE_ITEM_RE}', 0)")
        ).alias("m"),
    ).select(
        "doc_id",
        F.regexp_extract("m", "^([0-9]{1,3})", 1).cast("int").alias("article"),
        F.nullif(F.regexp_extract("m", "\\(([0-9]{1,2})\\)", 1), F.lit(""))
        .cast("int")
        .alias("paragraph"),
        F.nullif(
            F.regexp_extract("m", "\\(([a-z])\\)", 1), F.lit("")
        ).alias("letter"),
    )
    valid = (
        refs.withColumn("par0", F.coalesce(F.col("paragraph"), F.lit(-1)))
        .withColumn("let0", F.coalesce(F.col("letter"), F.lit("-")))
        .join(F.broadcast(tree), ["article", "par0", "let0"], "left_semi")
    )
    return (
        valid.join(
            F.broadcast(chap),
            (F.col("article") >= F.col("min_art"))
            & (F.col("article") <= F.col("max_art")),
            "left",
        )
        .groupBy("doc_id", "article", "paragraph", "letter", "chapter", "section")
        .agg(F.count("*").cast("bigint").alias("n_refs"))
    )


def citation_count(docs: DataFrame) -> DataFrame:
    """A3: count of gdpr/rgpd/2016/679 tokens per doc."""
    d = with_citation_text(docs)
    return d.select(
        "doc_id",
        F.expr(
            "size(filter(split(lower(text), '\\\\s+'), "
            "w -> w in ('gdpr', 'rgpd', '2016/679')))"
        )
        .cast("bigint")
        .alias("n_citations"),
    )


# ---------------------------------------------------------------------------
# A6 full semantics: penalty/fine sentence gate -> numeric-word join ->
# currency dimension match (code / plural / symbol forms)
# ---------------------------------------------------------------------------

#: EU currency dimension — the reference ships this as
#: ``pygdpr/assets/eu-currencies.json`` (consumed at
#: ``monetary_penalties_metadata_service/__init__.py:37-58``); facts of
#: the currencies themselves, deduplicated per code.
EU_CURRENCIES: list[tuple[str, str | None, tuple[str, ...]]] = [
    # (code, symbol, plural names)
    ("EUR", "€", ("euro", "euros")),
    ("BGN", None, ("leva", "levove")),
    ("CZK", "kč", ()),
    ("DKK", "kr.", ("kroner",)),
    ("HUF", "ft", ("forint", "forints")),
    ("PLN", "zł", ("zlote", "zlotych")),
    ("RON", None, ("lei",)),
    ("SEK", "kr", ("kronor",)),
    ("HRK", "kn", ("kuna", "kune")),
    ("GBP", "£", ("pound", "pounds")),
]

#: one match pattern per (code, form); built once in python so the Spark
#: expression and the DuckDB oracle compile the SAME regexes
def _currency_patterns() -> list[tuple[str, str]]:
    pats = []
    for code, symbol, plurals in EU_CURRENCIES:
        lc = code.lower()
        # code followed by a number ("eur 1234567") — :43-45
        pats.append((code, rf"\b{lc} ([0-9]+)\b"))
        if plurals:
            # number followed by a plural name ("1234 kroner") — :39-42
            pats.append((code, rf"\b([0-9]+) (?:{'|'.join(plurals)})\b"))
        if symbol:
            es = re.escape(symbol)
            # symbol attached or space-separated ("€1234", "1234 kč") — :46-56
            pats.append((code, rf"{es} ?([0-9]+)\b"))
            pats.append((code, rf"\b([0-9]+) ?{es}"))
    return pats


def with_penalty_text(docs: DataFrame) -> DataFrame:
    """Deterministic penalty sentences: a gated sentence in one of three
    currency forms (digit-grouped numbers for the code/plural forms so
    the numeric-word join does real work), a decoy amount WITHOUT the
    penalty/fine keyword, and every 5th doc with no penalty at all."""
    amt = (F.col("doc_id") * 977 % 9_000_000 + 1000).cast("long")
    grouped = F.regexp_replace(F.format_number(amt, 0), ",", " ")
    cur_idx = (F.col("doc_id") % 10).cast("int")
    codes = F.array(*[F.lit(c) for c, _, _ in EU_CURRENCIES])
    plural0 = F.array(
        *[F.lit(p[0] if p else c.lower()) for c, _, p in EU_CURRENCIES]
    )
    form = F.col("doc_id") % 4
    sent = (
        F.when(form == 0, F.concat(F.lit(" A fine of "), F.element_at(codes, cur_idx + 1), F.lit(" "), grouped, F.lit(" was imposed.")))
        .when(form == 1, F.concat(F.lit(" The penalty was "), grouped, F.lit(" "), F.element_at(plural0, cur_idx + 1), F.lit(" in total.")))
        .when(form == 2, F.concat(F.lit(" A fine of €"), amt.cast("string"), F.lit(" was announced.")))
        .otherwise(F.concat(F.lit(" The fine amounts to "), amt.cast("string"), F.lit(" kr.")))
    )
    tail = F.when(
        F.col("doc_id") % 5 == 4, F.lit(" No sanction was issued.")
    ).otherwise(sent)
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(". The budget of €999 is unrelated."),  # decoy: no keyword
            tail,
        ),
    )


DUCK_PENALTY_TEXT = (
    "text || '. The budget of €999 is unrelated.' || "
    "(CASE WHEN doc_id % 5 = 4 THEN ' No sanction was issued.' ELSE "
    "(CASE doc_id % 4 "
    " WHEN 0 THEN ' A fine of ' || list_extract({codes}, cast(doc_id % 10 as int) + 1)"
    "   || ' ' || replace(format('{{:,}}', doc_id * 977 % 9000000 + 1000), ',', ' ') || ' was imposed.'"
    " WHEN 1 THEN ' The penalty was ' || replace(format('{{:,}}', doc_id * 977 % 9000000 + 1000), ',', ' ')"
    "   || ' ' || list_extract({plurals}, cast(doc_id % 10 as int) + 1) || ' in total.'"
    " WHEN 2 THEN ' A fine of €' || cast(doc_id * 977 % 9000000 + 1000 as varchar) || ' was announced.'"
    " ELSE ' The fine amounts to ' || cast(doc_id * 977 % 9000000 + 1000 as varchar) || ' kr.' END) END)"
).format(
    codes="[" + ", ".join(f"'{c}'" for c, _, _ in EU_CURRENCIES) + "]",
    plurals="["
    + ", ".join(f"'{p[0] if p else c.lower()}'" for c, _, p in EU_CURRENCIES)
    + "]",
)


def monetary_penalties_full(docs: DataFrame) -> DataFrame:
    """A6 with the reference's structure
    (monetary_penalties_metadata_service/__init__.py:6-79):

    1. sentence scan, keep sentences naming a penalty/fine (:30);
    2. join adjacent numeric words ("900 000" -> "900000",
       join_numeric_words :7-21) — two global passes of ``(\\d) (\\d)``
       removal (no lookaround, RE2-safe);
    3. currency-dimension match (eu-currencies.json): code-then-number,
       number-then-plural, symbol attached/separated (:37-58);
    4. emit (doc_id, currency_code, amount, n) — price_parser collapses
       to a digits cast under the deterministic fixture forms.
    """
    d = with_penalty_text(docs)
    sent = d.select(
        "doc_id",
        F.explode(F.expr("split(lower(text), '[.!?] ')")).alias("sent"),
    ).filter(F.col("sent").rlike(r"\b(penalty|fine)\b"))
    joined = sent.withColumn(
        "sent",
        F.regexp_replace(
            F.regexp_replace(F.col("sent"), r"([0-9]) ([0-9])", r"$1$2"),
            r"([0-9]) ([0-9])",
            r"$1$2",
        ),
    )
    parts = []
    for code, pat in _currency_patterns():
        parts.append(
            joined.select(
                "doc_id",
                F.lit(code).alias("currency_code"),
                F.explode(
                    F.expr(
                        "regexp_extract_all(sent, '"
                        + pat.replace("\\", "\\\\").replace("'", "''")
                        + "', 1)"
                    )
                ).alias("amt"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.select(
            "doc_id",
            "currency_code",
            F.col("amt").cast("double").alias("amount"),
        )
        .groupBy("doc_id", "currency_code", "amount")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# A5 full semantics: absolute-date search (day+month+year all present)
# ---------------------------------------------------------------------------

EN_MONTHS = (
    "january", "february", "march", "april", "may", "june", "july",
    "august", "september", "october", "november", "december",
)
#: ``%b`` abbreviations (each is the full name's first three letters) —
#: AbsoluteDateSpecification.month_is_present accepts them
#: (absolute_date_specification.py:10-16: ``date.strftime('%b')``), so
#: dateparser hits like "3 jan 2021" pass the reference's filter.  Note
#: the spec compares TOKENS, so only the exact three-letter form counts
#: ("sept" is rejected — the token differs from strftime's "sep").
EN_MONTHS_ABBR = tuple(m[:3] for m in EN_MONTHS)
_MONTHS_ALT = "|".join(EN_MONTHS)
#: abbreviation alternation minus names equal to a full name ("may") —
#: those already match the full-name patterns; keeping them out of the
#: abbr ALTERNATION prevents the same substring matching two forms.
#: Resolution still uses the FULL abbr table so positions line up.
_ABBR_ALT = "|".join(m for m in EN_MONTHS_ABBR if m not in EN_MONTHS)

#: the absolute forms the deterministic search recognizes — the
#: reference uses ``dateparser.search_dates(s, languages=['en'],
#: STRICT_PARSING)`` with the freshness (relative-date) parser DISABLED
#: (timeline_metadata_service/__init__.py:13,21-24) plus
#: AbsoluteDateSpecification (day AND month AND year present as TOKENS
#: of the matched snippet, absolute_date_specification.py:36-45);
#: month-only or relative expressions never match these patterns.
#:
#: Ordinal-day forms ("the 3rd of may, 2021", "may 3rd, 2021") are
#: deliberately ABSENT: dateparser parses them, but the spec's
#: ``day_is_present`` (absolute_date_specification.py:5-9) looks for the
#: bare day numeral among the snippet's word tokens and "3rd" is a
#: single token — so the reference emits NOTHING for them.  The fixture
#: still plants both as negative decoys.  ``date_tokenize``
#: (:24-34) splits tokens on '-' and '/', which is what admits the
#: dashed and slashed numeric forms below.
TIMELINE_FORMS = (
    # (pattern, day grp, month grp (numeric), month-name grp, year grp,
    #  month-name resolution table)
    (r"\b([0-9]{4})-([0-9]{2})-([0-9]{2})\b", 3, 2, None, 1, None),
    (r"\b([0-9]{1,2})-([0-9]{2})-([0-9]{4})\b", 1, 2, None, 3, None),
    (rf"\b([0-9]{{1,2}}) ({_MONTHS_ALT}) ([0-9]{{4}})\b", 1, None, 2, 3, EN_MONTHS),
    # comma optional: dateparser finds "may 3 2021" as well as "may 3, 2021"
    (rf"\b({_MONTHS_ALT}) ([0-9]{{1,2}}),? ([0-9]{{4}})\b", 2, None, 1, 3, EN_MONTHS),
    (rf"\b([0-9]{{1,2}}) ({_ABBR_ALT}) ([0-9]{{4}})\b", 1, None, 2, 3, EN_MONTHS_ABBR),
    (rf"\b({_ABBR_ALT}) ([0-9]{{1,2}}),? ([0-9]{{4}})\b", 2, None, 1, 3, EN_MONTHS_ABBR),
    # dashed month-name dates: date_tokenize splits "3-may-2021" into
    # day/month/year tokens, so the spec accepts them
    (rf"\b([0-9]{{1,2}})-({_MONTHS_ALT})-([0-9]{{4}})\b", 1, None, 2, 3, EN_MONTHS),
    (rf"\b([0-9]{{1,2}})-({_ABBR_ALT})-([0-9]{{4}})\b", 1, None, 2, 3, EN_MONTHS_ABBR),
)

#: slash-numeric form with dateparser's English resolution: MDY when the
#: first number can be a month, else DMY fallback ("05/03/2021" -> 3 May
#: read as May 3; "13/05/2021" -> 13 May).  Handled apart from
#: TIMELINE_FORMS because day/month assignment is conditional.
TIMELINE_FLEX_FORM = r"\b([0-9]{1,2})/([0-9]{1,2})/([0-9]{4})\b"

#: Locale month-name forms (round-3 VERDICT next #5): the reference's
#: dateparser resolves "17 mai 2021" only when the doc's language is
#: requested (``search_dates(..., languages=[lc])``,
#: timeline_metadata_service/__init__.py:20-23), so each locale form is
#: GATED on the document's ``lang`` column — reusing the X7
#: LOCALE_MONTHS vocabulary (extract.py).  Names a locale shares with
#: English (de: april/august/september/november) are dropped from the
#: locale ALTERNATION — the always-active English form already resolves
#: them to the same month number — so no date is ever double-counted.
TIMELINE_LOCALE_MONTHS: dict[str, tuple[str, ...]] = {}


def _init_timeline_locales() -> None:
    # ALL of X7's locale vocabularies are wired in (round-4 VERDICT
    # next #3 named hr/pl; hu/nl ride along) — the same month tables
    # parse_date_str uses (extract.py LOCALE_MONTHS), so the two date
    # subsystems can never drift.  Note hr and pl both contain
    # 'listopada' at DIFFERENT months (hr: October, pl: November) —
    # exactly why the forms are gated on the doc's lang like
    # dateparser's languages=[lc].
    from .extract import (
        DE_MONTHS, ES_MONTHS, FR_MONTHS, HR_MONTHS, HU_MONTHS,
        NL_MONTHS, PL_MONTHS,
    )

    TIMELINE_LOCALE_MONTHS.update(
        {
            "fr": FR_MONTHS, "es": ES_MONTHS, "de": DE_MONTHS,
            "hr": HR_MONTHS, "hu": HU_MONTHS, "nl": NL_MONTHS,
            "pl": PL_MONTHS,
        }
    )


_init_timeline_locales()

#: the driver's synthetic documents table only carries
#: en/zh/es/de/fr langs, so the timeline FIXTURE deterministically
#: remaps half of the en docs onto the four extra locales — both
#: engines apply the identical remap (DUCK_TIMELINE_LANG below).
TIMELINE_EXTRA_LANGS = ("hr", "hu", "nl", "pl")

#: DuckDB twin of the lang remap in :func:`with_timeline_text`
#: (columns resolved against the oracle's ``d`` = documents alias)
DUCK_TIMELINE_LANG = (
    "(CASE WHEN d.lang = 'en' AND d.doc_id % 2 = 1 THEN list_extract(["
    + ", ".join(f"'{lc}'" for lc in TIMELINE_EXTRA_LANGS)
    + "], cast((d.doc_id // 2) % 4 + 1 as int)) ELSE d.lang END)"
)

#: numeric CJK date ("2021年5月17日") for zh docs — dateparser's zh
#: locale recognizes this absolute form; no word boundaries (CJK has
#: none).
TIMELINE_ZH_FORM = r"([0-9]{4})年([0-9]{1,2})月([0-9]{1,2})日"


def _locale_alt(lc: str) -> str:
    """Regex alternation for a locale's month names minus EN overlaps."""
    return "|".join(
        m for m in TIMELINE_LOCALE_MONTHS[lc] if m not in EN_MONTHS
    )


def with_timeline_text(docs: DataFrame) -> DataFrame:
    """One absolute date per doc in a rotating form + a decoy that has
    no day component (month+year — AbsoluteDateSpecification rejects)."""
    n = (F.col("doc_id") % 2000).cast("int")
    y = (F.lit(2018) + (n / 365).cast("int")).cast("int")
    m = (n % 12 + 1).cast("int")
    dd = (n % 28 + 1).cast("int")
    months = F.array(*[F.lit(x) for x in EN_MONTHS])
    mname = F.element_at(months, m)
    two = lambda c: F.lpad(c.cast("string"), 2, "0")
    suffix = (
        F.when((dd % 10 == 1) & (dd != 11), F.lit("st"))
        .when((dd % 10 == 2) & (dd != 12), F.lit("nd"))
        .when((dd % 10 == 3) & (dd != 13), F.lit("rd"))
        .otherwise(F.lit("th"))
    )
    dd_ord = F.concat(dd.cast("string"), suffix)
    mabbr = F.substring(mname, 1, 3)
    form = F.col("doc_id") % 10
    datestr = (
        F.when(form == 0, F.concat(y.cast("string"), F.lit("-"), two(m), F.lit("-"), two(dd)))
        .when(form == 1, F.concat(two(dd), F.lit("-"), two(m), F.lit("-"), y.cast("string")))
        .when(form == 2, F.concat(dd.cast("string"), F.lit(" "), mname, F.lit(" "), y.cast("string")))
        .when(form == 3, F.concat(mname, F.lit(" "), dd.cast("string"), F.lit(", "), y.cast("string")))
        # NEGATIVE decoys: dateparser parses ordinal-day forms but the
        # reference's AbsoluteDateSpecification rejects them ("3rd" is
        # one token, so the bare day numeral is absent —
        # absolute_date_specification.py:5-9,36-45); neither engine may
        # emit an event for forms 4-5
        .when(form == 4, F.concat(F.lit("the "), dd_ord, F.lit(" of "), mname, F.lit(", "), y.cast("string")))
        .when(form == 5, F.concat(mname, F.lit(" "), dd_ord, F.lit(", "), y.cast("string")))
        .when(form == 6, F.concat(m.cast("string"), F.lit("/"), dd.cast("string"), F.lit("/"), y.cast("string")))
        # %b abbreviated months, comma-less month-first, dashed names
        .when(form == 7, F.concat(dd.cast("string"), F.lit(" "), mabbr, F.lit(" "), y.cast("string")))
        .when(form == 8, F.concat(mabbr, F.lit(" "), dd.cast("string"), F.lit(" "), y.cast("string")))
        .otherwise(F.concat(dd.cast("string"), F.lit("-"), mname, F.lit("-"), y.cast("string")))
    )
    # locale sentence: docs in fr/es/de/hr/hu/nl/pl carry one extra
    # absolute date in their own language's month names, zh docs the
    # numeric CJK form — only the lang-gated locale form of
    # timeline_full may resolve it.  Half the en docs are remapped onto
    # the four extra locales (the synthetic corpus carries none); the
    # remapped lang is written back onto the output so the parse side
    # gates on the same value the fixture planted.
    lang = F.col("lang") if "lang" in docs.columns else F.lit("en")
    extra_langs = F.array(*[F.lit(x) for x in TIMELINE_EXTRA_LANGS])
    lang = F.when(
        (lang == "en") & (F.col("doc_id") % 2 == 1),
        F.element_at(
            extra_langs,
            (F.expr("cast(doc_id div 2 as int)") % len(TIMELINE_EXTRA_LANGS) + 1),
        ),
    ).otherwise(lang)
    loc = F.lit(None).cast("string")
    for lc, months_t in sorted(TIMELINE_LOCALE_MONTHS.items()):
        arr = F.array(*[F.lit(x) for x in months_t])
        loc = F.when(
            lang == lc,
            F.concat(dd.cast("string"), F.lit(" "), F.element_at(arr, m),
                     F.lit(" "), y.cast("string")),
        ).otherwise(loc)
    loc = F.when(
        lang == "zh",
        F.concat(y.cast("string"), F.lit("年"), m.cast("string"),
                 F.lit("月"), dd.cast("string"), F.lit("日")),
    ).otherwise(loc)
    extra = F.when(
        loc.isNotNull(),
        F.concat(F.lit(". Registered locally on "), loc),
    ).otherwise(F.lit(""))
    return docs.withColumn("lang", lang).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(". The decision was issued on "), datestr,
            extra,
            F.lit(". Proceedings opened in "), mname,
            F.lit(" "), y.cast("string"), F.lit(" generally."),
        ),
    )


#: DuckDB twin of the ordinal-suffixed day in :func:`with_timeline_text`
_DUCK_DD_ORD = (
    "(cast(dd as varchar) || CASE"
    " WHEN dd % 10 = 1 AND dd != 11 THEN 'st'"
    " WHEN dd % 10 = 2 AND dd != 12 THEN 'nd'"
    " WHEN dd % 10 = 3 AND dd != 13 THEN 'rd'"
    " ELSE 'th' END)"
)

def _duck_month_list(lc: str) -> str:
    return "[" + ", ".join(f"'{m}'" for m in TIMELINE_LOCALE_MONTHS[lc]) + "]"


_DUCK_LOCALE_EXTRA = (
    "(CASE "
    + " ".join(
        f"WHEN lang = '{lc}' THEN '. Registered locally on '"
        f" || cast(dd as varchar) || ' ' || list_extract({_duck_month_list(lc)}, mm)"
        f" || ' ' || cast(yy as varchar)"
        for lc in sorted(TIMELINE_LOCALE_MONTHS)
    )
    + " WHEN lang = 'zh' THEN '. Registered locally on '"
    " || cast(yy as varchar) || '年' || cast(mm as varchar) || '月'"
    " || cast(dd as varchar) || '日'"
    " ELSE '' END)"
)

DUCK_TIMELINE_TEXT = (
    "text || '. The decision was issued on ' || "
    "(CASE doc_id % 10 "
    " WHEN 0 THEN cast(yy as varchar) || '-' || lpad(cast(mm as varchar),2,'0') || '-' || lpad(cast(dd as varchar),2,'0')"
    " WHEN 1 THEN lpad(cast(dd as varchar),2,'0') || '-' || lpad(cast(mm as varchar),2,'0') || '-' || cast(yy as varchar)"
    " WHEN 2 THEN cast(dd as varchar) || ' ' || mname || ' ' || cast(yy as varchar)"
    " WHEN 3 THEN mname || ' ' || cast(dd as varchar) || ', ' || cast(yy as varchar)"
    f" WHEN 4 THEN 'the ' || {_DUCK_DD_ORD} || ' of ' || mname || ', ' || cast(yy as varchar)"
    f" WHEN 5 THEN mname || ' ' || {_DUCK_DD_ORD} || ', ' || cast(yy as varchar)"
    " WHEN 6 THEN cast(mm as varchar) || '/' || cast(dd as varchar) || '/' || cast(yy as varchar)"
    " WHEN 7 THEN cast(dd as varchar) || ' ' || substr(mname,1,3) || ' ' || cast(yy as varchar)"
    " WHEN 8 THEN substr(mname,1,3) || ' ' || cast(dd as varchar) || ' ' || cast(yy as varchar)"
    " ELSE cast(dd as varchar) || '-' || mname || '-' || cast(yy as varchar) END)"
    f" || {_DUCK_LOCALE_EXTRA}"
    " || '. Proceedings opened in ' || mname || ' ' || cast(yy as varchar) || ' generally.'"
)


def timeline_full(docs: DataFrame) -> DataFrame:
    """A5 with the reference's absolute-date semantics
    (timeline_metadata_service/__init__.py:8-41 + the day/month/year
    token-presence spec): per sentence, collect dates where the bare day
    numeral, a month (full name, ``%b`` abbreviation, or number) AND a
    4-digit year are explicitly present as snippet tokens — the
    :data:`TIMELINE_FORMS` family standing in for dateparser's fuzzy
    ``search_dates``, whose freshness (relative-date) parser the
    reference disables outright (:13).  Ordinal-day hits are rejected
    exactly as AbsoluteDateSpecification does (see TIMELINE_FORMS).
    Emits dd/MM/yyyy strings (:31).  The lang-gated locale forms extend
    the reference (which hardcodes ``languages=['en']``, :21) the way
    its per-country scrapers would need.
    Output: (doc_id, date_str, n).
    """
    d = with_timeline_text(docs)
    lang = F.col("lang") if "lang" in d.columns else F.lit("en")
    sent = d.select(
        "doc_id",
        lang.alias("lang"),
        F.explode(F.expr("split(lower(text), '[.!?] ')")).alias("sent"),
    )
    parts = []
    for pat, gd, gm, gmn, gy, mtab in TIMELINE_FORMS:
        sql_pat = pat.replace("\\", "\\\\").replace("'", "''")
        m = sent.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(sent, '{sql_pat}', 0)")
            ).alias("m"),
        )
        day = F.regexp_extract("m", pat, gd).cast("int")
        year = F.regexp_extract("m", pat, gy)
        if gm is not None:
            month = F.regexp_extract("m", pat, gm).cast("int")
        else:
            months = F.array(*[F.lit(x) for x in mtab])
            month = F.array_position(months, F.regexp_extract("m", pat, gmn)).cast(
                "int"
            )
        parts.append(
            m.select(
                "doc_id",
                F.concat(
                    F.lpad(day.cast("string"), 2, "0"), F.lit("/"),
                    F.lpad(month.cast("string"), 2, "0"), F.lit("/"), year,
                ).alias("date_str"),
            )
        )
    # slash-numeric flex form: MDY unless the first number exceeds 12
    # (dateparser's English resolution), so day/month are conditional
    flex_pat = TIMELINE_FLEX_FORM
    flex_sql = flex_pat.replace("\\", "\\\\").replace("'", "''")
    fm = sent.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(sent, '{flex_sql}', 0)")
        ).alias("m"),
    )
    n1 = F.regexp_extract("m", flex_pat, 1).cast("int")
    n2 = F.regexp_extract("m", flex_pat, 2).cast("int")
    fyear = F.regexp_extract("m", flex_pat, 3)
    fmonth = F.when(n1 <= 12, n1).otherwise(n2)
    fday = F.when(n1 <= 12, n2).otherwise(n1)
    parts.append(
        fm.select(
            "doc_id",
            F.concat(
                F.lpad(fday.cast("string"), 2, "0"), F.lit("/"),
                F.lpad(fmonth.cast("string"), 2, "0"), F.lit("/"), fyear,
            ).alias("date_str"),
        )
    )
    # locale month-name forms, gated on the doc's language exactly like
    # dateparser's languages=[lc]; month resolved against the FULL
    # locale table (the alternation drops EN-shared names — those
    # resolve through the always-active English form above)
    for lc in sorted(TIMELINE_LOCALE_MONTHS):
        lpat = rf"\b([0-9]{{1,2}}) ({_locale_alt(lc)}) ([0-9]{{4}})\b"
        lsql = lpat.replace("\\", "\\\\").replace("'", "''")
        larr = F.array(*[F.lit(x) for x in TIMELINE_LOCALE_MONTHS[lc]])
        lm = sent.filter(F.col("lang") == lc).select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(sent, '{lsql}', 0)")
            ).alias("m"),
        )
        parts.append(
            lm.select(
                "doc_id",
                F.concat(
                    F.lpad(F.regexp_extract("m", lpat, 1).cast("int").cast("string"), 2, "0"),
                    F.lit("/"),
                    F.lpad(
                        F.array_position(larr, F.regexp_extract("m", lpat, 2))
                        .cast("int").cast("string"), 2, "0",
                    ),
                    F.lit("/"), F.regexp_extract("m", lpat, 3),
                ).alias("date_str"),
            )
        )
    # numeric CJK form for zh docs
    zsql = TIMELINE_ZH_FORM.replace("\\", "\\\\").replace("'", "''")
    zm = sent.filter(F.col("lang") == "zh").select(
        "doc_id",
        F.explode(F.expr(f"regexp_extract_all(sent, '{zsql}', 0)")).alias("m"),
    )
    parts.append(
        zm.select(
            "doc_id",
            F.concat(
                F.lpad(F.regexp_extract("m", TIMELINE_ZH_FORM, 3).cast("int").cast("string"), 2, "0"),
                F.lit("/"),
                F.lpad(F.regexp_extract("m", TIMELINE_ZH_FORM, 2).cast("int").cast("string"), 2, "0"),
                F.lit("/"), F.regexp_extract("m", TIMELINE_ZH_FORM, 1),
            ).alias("date_str"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("doc_id", "date_str").agg(
        F.count("*").cast("bigint").alias("n")
    )


def keywords_topk(docs: DataFrame, n: int = 2, k: int = 5) -> DataFrame:
    """A4: top-k bigrams per doc by frequency (CountVectorizer analog).

    explode n-grams -> count -> per-doc rank window; ties broken by the
    gram string for determinism.  Output: (doc_id, gram, n_occ, rnk).
    """
    from .corpus import seq1, with_tokens

    n_sh = f"size(tokens) - {n - 1}"
    grams = with_tokens(docs).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform({seq1(n_sh)}, "
                f"i -> concat_ws(' ', slice(tokens, i, {n})))"
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(
        F.count("*").cast("bigint").alias("n_occ")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_occ"), F.asc("gram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )


#: English stopwords (the NLTK list the reference loads at
#: keywords_metadata_service/__init__.py:16 — standard public list).
EN_STOPWORDS = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down",
    "in", "out", "on", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same", "so",
    "than", "too", "very", "s", "t", "can", "will", "just", "don",
    "should", "now",
)


#: WordNet noun.exc irregular plurals (public exception-list subset),
#: layered OVER the suffix rules below exactly like morphy consults its
#: exception table first (round-4 VERDICT next #5).  The reference runs
#: ``lem.lemmatize(word)`` with the DEFAULT pos='n'
#: (keywords_metadata_service/__init__.py:23), so only NOUN exceptions
#: apply — 'better' and 'ran' are identity under pos='n' and stay
#: untouched by design.  Entries where morphy's min-length tie-break
#: prefers a rule-derived noun over the exception (e.g. 'bases'→'base')
#: are deliberately omitted so the table never disagrees with WordNet.
LEMMA_EXC: dict[str, str] = {
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "oxen": "ox",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "loaves": "loaf", "halves": "half", "selves": "self",
    "shelves": "shelf", "thieves": "thief", "wolves": "wolf",
    "elves": "elf", "calves": "calf", "analyses": "analysis",
    "crises": "crisis", "theses": "thesis", "hypotheses": "hypothesis",
    "indices": "index", "matrices": "matrix", "appendices": "appendix",
    "criteria": "criterion", "phenomena": "phenomenon",
}

_LEMMA_EXC_CASE = (
    "CASE w "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in sorted(LEMMA_EXC.items()))
    + " END"
)

#: deterministic lemma step standing in for WordNet lemmatization
#: (keywords_metadata_service/__init__.py:20-24): the irregular-form
#: exception table first (a literal CASE map — it ships inside the
#: plan and stays in whole-stage codegen, which beats a broadcast join
#: here because the per-token transform must preserve array order for
#: the n-gram step), then plural suffix rules ies->y / keep -ss /
#: strip trailing -s, written without regex backreferences so Spark
#: and DuckDB compile byte-identical transforms.
LEMMA_SQL = (
    f"coalesce({_LEMMA_EXC_CASE}, "
    "CASE WHEN w LIKE '%ss' THEN w "
    "WHEN w LIKE '%s' THEN left(w, length(w) - 1) ELSE w END)"
)
#: adverb drop standing in for the pos_tag 'RB' filter (:25-29):
#: -ly suffix heuristic (deterministic; nltk's tagger is not)
ADVERB_SQL = "NOT (w LIKE '%ly' AND length(w) > 4)"


def keywords_full(docs: DataFrame, k: int = 20) -> DataFrame:
    """A4 with the reference's pipeline shape
    (keywords_metadata_service/__init__.py:14-35): strip non-letters,
    lowercase, drop English stopwords, drop adverbs (deterministic -ly
    rule for pos_tag RB), lemmatize (deterministic suffix table for
    WordNet), then CountVectorizer ``ngram_range=(1,3)`` frequencies,
    top-k per doc.  Ties break on the gram string.
    Output: (doc_id, gram, n_occ, rnk).
    """
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = docs.select(
        "doc_id",
        F.expr(
            "transform(transform("
            "filter(split(lower(regexp_replace(text, '[^a-zA-Z]', ' ')), ' +'), "
            f"w -> w <> '' AND NOT array_contains(array({stop}), w) "
            f"AND {ADVERB_SQL}), "
            "w -> regexp_replace(w, 'ies$', 'y')), "
            f"w -> {LEMMA_SQL})"
        ).alias("tokens"),
    )
    parts = []
    for n in (1, 2, 3):
        parts.append(
            toks.select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, greatest(size(tokens) - {n - 1}, 0)), "
                        f"i -> concat_ws(' ', slice(tokens, i, {n})))"
                    )
                ).alias("gram"),
            )
        )
    grams = parts[0].unionByName(parts[1]).unionByName(parts[2])
    counts = grams.groupBy("doc_id", "gram").agg(
        F.count("*").cast("bigint").alias("n_occ")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_occ"), F.asc("gram"))
    return counts.withColumn("rnk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rnk") <= k
    )


def timeline(docs: DataFrame) -> DataFrame:
    """A5: absolute dates found in text -> (doc_id, event_date:string)."""
    d = with_citation_text(docs)
    return d.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{DATE_RE}', 0)")
        ).alias("event_date"),
    )


def monetary_penalties(docs: DataFrame) -> DataFrame:
    """A6: currency amounts -> (doc_id, amount:bigint, currency)."""
    d = with_citation_text(docs)
    return (
        d.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(text, '{MONEY_RE}', 1)")
            ).alias("amt"),
        )
        .select(
            "doc_id",
            F.col("amt").cast("bigint").alias("amount"),
            F.lit("EUR").alias("currency"),
        )
    )


def join_lines(docs: DataFrame) -> DataFrame:
    """X8: merge lines broken mid-sentence (join_lines_pdf_to_text).

    Rule (joins_lines_specification.py:13-31): join line k to k+1 when k
    does not end in terminal punctuation AND k+1 starts with a lowercase
    letter.  Implemented as a pure fold over split lines with a struct
    accumulator — single projection, no UDF.
    Output: (doc_id, joined_text).
    """
    fold = (
        "aggregate(slice(lines, 2, size(lines) - 1), "
        "named_struct('acc', lines[0]), "
        "(s, x) -> named_struct('acc', concat(s.acc, "
        "case when s.acc rlike '[.!?:;]$' then '\\n' "
        "when x rlike '^[a-z]' then ' ' else '\\n' end, x)), "
        "s -> s.acc)"
    )
    return (
        docs.withColumn("lines", F.split("text", "\n"))
        .select(
            "doc_id",
            F.when(F.size("lines") <= 1, F.col("text"))
            .otherwise(F.expr(fold))
            .alias("joined_text"),
        )
    )


DOC_KEY_ALPHABET = "123456789BCDFGHJKLMNPQRSTVWXYZ"  # 30 unambiguous chars


def doc_keys(docs: DataFrame) -> DataFrame:
    """X10: deterministic push-key 'K YYMMDD - XXXX Q' per document.

    The reference uses random.randint over a 31-char alphabet
    (document_key_service.py:5-27) — nondeterministic; replaced by an
    md5-derived draw per SURVEY.md X10 so keys are stable and
    oracle-checkable.  Output: (doc_id, doc_key).
    """
    n = len(DOC_KEY_ALPHABET)
    chars = [
        F.substring(
            F.lit(DOC_KEY_ALPHABET),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.col("text"), F.lit(f":{i}"))), 1, 7),
                    16,
                    10,
                ).cast("long")
                % n
                + 1
            ).cast("int"),
            1,
        )
        for i in range(4)
    ]
    return docs.select(
        "doc_id",
        F.concat(F.lit("K "), F.concat(*chars)).alias("doc_key"),
    )
