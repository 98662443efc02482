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

#: Partial GDPR article validation tree: article -> {paragraph -> letters}.
#: The reference ships the full structure as
#: ``gdpr/assets/gdpr-article-validation-tree.json`` (consumed at
#: ``valid_gdpr_article_ref_specification.py:4-38``); this embedded subset
#: covers the commonly-cited articles and is the swap point for the full
#: tree — validation semantics (art must exist; (art,par) and
#: (art,par,let) must be in the tree) are identical.  Bare articles 1-99
#: are always valid (every GDPR article is a tree key).
GDPR_TREE: dict[int, dict[int, str]] = {
    5: {1: "abcdef", 2: ""},
    6: {1: "abcdef", 2: "", 3: "ab", 4: "abcde"},
    7: {1: "", 2: "", 3: "", 4: ""},
    9: {1: "", 2: "abcdefghij", 3: "", 4: ""},
    12: {1: "", 2: "", 3: "", 4: "", 5: "ab", 6: "", 7: "", 8: ""},
    13: {1: "abcdef", 2: "abcdef", 3: "", 4: ""},
    15: {1: "abcdefgh", 2: "", 3: "", 4: ""},
    17: {1: "abcdef", 2: "", 3: "abcde"},
    21: {1: "", 2: "", 3: "", 4: "", 5: "", 6: ""},
    25: {1: "", 2: "", 3: ""},
    28: {1: "", 2: "", 3: "abcdefgh", 4: "", 5: "", 6: "", 7: "", 8: "", 9: "", 10: ""},
    32: {1: "abcd", 2: "", 3: "", 4: ""},
    33: {1: "", 2: "", 3: "abcd", 4: "", 5: ""},
    34: {1: "", 2: "", 3: "abc", 4: ""},
    35: {i: "" for i in range(1, 12)},
    58: {1: "abcdef", 2: "abcdefghij", 3: "abcdefghij", 4: "", 5: "", 6: ""},
    83: {i: "" for i in range(1, 10)},
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
    the join is a plain equi-join on both engines)."""
    rows = [(a, -1, "-") for a in range(1, 100)]
    for art, pars in GDPR_TREE.items():
        for par, letters in pars.items():
            rows.append((art, par, "-"))
            rows.extend((art, par, l) for l in letters)
    return rows


#: ref pattern: article N [(par)] [(let)] — groups 1/3/5.  Java regex and
#: RE2 parse it identically (no lookaround, no backrefs).
CITE_FULL_RE = "[Aa]rticle ([0-9]{1,3})(\\\\(([0-9]{1,2})\\\\))?(\\\\(([a-z])\\\\))?"


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
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(". Article "), a1, F.lit("("), p1, F.lit(")("), l1,
            F.lit(") and Article "), a2,
            F.lit(" of Regulation 2016/679 were infringed"),
            F.lit(". Article "), a3, F.lit("(2) is discussed elsewhere."),
        ),
    )


DUCK_CITATION_FULL_TEXT = (
    "text || '. Article ' || cast(doc_id % 120 + 1 as varchar)"
    " || '(' || cast(doc_id % 9 + 1 as varchar) || ')('"
    " || chr(97 + cast(doc_id % 8 as int)) || ') and Article '"
    " || cast(doc_id % 99 + 1 as varchar)"
    " || ' of Regulation 2016/679 were infringed'"
    " || '. Article ' || cast(doc_id % 50 + 1 as varchar)"
    " || '(2) is discussed elsewhere.'"
)


def citations_full(docs: DataFrame) -> DataFrame:
    """A2 with the reference's full structure
    (citations_metadata_service/__init__.py:38-191):

    1. sentence scan — only sentences naming both an article and the
       regulation ('2016/679' / 'gdpr') yield refs (:44-67 gate);
    2. refs = article + optional (paragraph) + optional (letter), the
       nearest-article attribution collapsed into one match (:93-146);
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
        F.lower(F.col("sent")).contains("article")
        & (
            F.col("sent").contains("2016/679")
            | F.lower(F.col("sent")).contains("gdpr")
        )
    )
    refs = sent.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(sent, '{CITE_FULL_RE}', 0)")
        ).alias("m"),
    ).select(
        "doc_id",
        F.regexp_extract("m", CITE_FULL_RE.replace("\\\\", "\\"), 1)
        .cast("int")
        .alias("article"),
        F.nullif(
            F.regexp_extract("m", CITE_FULL_RE.replace("\\\\", "\\"), 3),
            F.lit(""),
        )
        .cast("int")
        .alias("paragraph"),
        F.nullif(
            F.regexp_extract("m", CITE_FULL_RE.replace("\\\\", "\\"), 5),
            F.lit(""),
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
