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
