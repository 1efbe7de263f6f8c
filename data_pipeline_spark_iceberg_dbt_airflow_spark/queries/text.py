"""Text-analysis operators over the ``documents`` table.

The reference's only string handling is column renames and casts
(/root/reference/README.md:368-384); these operators are the
training-data-pipeline extension set: per-document statistics, quality
scoring, language identification, BPE-style token counting, and
rolling-hash fingerprinting.

Everything stays JVM-side: built-in regexp / array / lambda expressions
(higher-order functions run inside whole-stage codegen), zero Python UDFs.
Each query is a narrow per-row projection (no shuffle at all) or one
map-side-combinable groupBy -- the shapes that scale linearly to 100 TB
because they never move the text itself, only small derived values.

Cross-engine notes: Spark (Java regex) and DuckDB (RE2) spell Unicode
escapes differently (``\\uXXXX`` vs ``\\x{XXXX}``) -- patterns are written
per-engine with identical semantics. Ratios are single double divisions of
exact integers (deterministic, order-free), never float aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

#: English stopword marker set for quality scoring (tiny on purpose: the
#: operator shape -- lambda filter over a token array against a broadcast
#: list -- is what scales, the lexicon is pluggable).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

_TOKS = r"regexp_extract_all(text, '\\S+', 0)"
_O_TOKS = r"regexp_extract_all(text, '\S+')"


def _toks() -> Column:
    return F.expr(_TOKS)


@register(
    "text_stats",
    oracle=rf"""
        SELECT doc_id,
               length(text) AS char_cnt,
               len({_O_TOKS}) AS token_cnt,
               len(list_distinct({_O_TOKS})) AS uniq_token_cnt,
               len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt,
               CASE WHEN len({_O_TOKS}) > 0
                    THEN CAST(list_sum(list_transform({_O_TOKS},
                              x -> length(x))) AS DOUBLE) / len({_O_TOKS})
                    ELSE NULL END AS avg_token_len
        FROM documents
    """,
    doc="Per-document statistics: char count, whitespace-token count, "
    "distinct-token count, punctuation count, average token length. Pure "
    "per-row projection over built-in regexp/array expressions -- no "
    "shuffle, no UDF; at 100 TB this is a single codegen'd scan emitting "
    "five small ints per document.",
    bench=True,
    tags=("text", "llm-data"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    t = _toks()
    token_cnt = F.size(t)
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, v: acc + v
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("char_cnt"),
        token_cnt.alias("token_cnt"),
        F.size(F.array_distinct(t)).alias("uniq_token_cnt"),
        F.size(F.expr(r"regexp_extract_all(text, '[.,;:!?]', 0)")).alias("punct_cnt"),
        F.when(token_cnt > 0, sum_len.cast("double") / token_cnt).alias(
            "avg_token_len"
        ),
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


@register(
    "text_quality",
    oracle=rf"""
        WITH c AS (
            SELECT doc_id,
                   length(text) AS char_cnt,
                   len({_O_TOKS}) AS token_cnt,
                   len(list_filter({_O_TOKS}, x -> x IN ({_STOP_SQL})))
                       AS stop_cnt,
                   len(regexp_extract_all(text, '[A-Za-z]')) AS alpha_cnt
            FROM documents)
        SELECT doc_id,
               CASE WHEN token_cnt > 0
                    THEN CAST(stop_cnt AS DOUBLE) / token_cnt END AS stop_ratio,
               CASE WHEN char_cnt > 0
                    THEN CAST(alpha_cnt AS DOUBLE) / char_cnt END AS alpha_ratio,
               CASE WHEN token_cnt > 0 AND char_cnt > 0
                    THEN (CAST(stop_cnt AS DOUBLE) / token_cnt) * 0.3
                       + (CAST(alpha_cnt AS DOUBLE) / char_cnt) * 0.4
                       + (CAST(LEAST(token_cnt, 100) AS DOUBLE) / 100) * 0.3
                    END AS quality_score
        FROM c
    """,
    doc="Heuristic quality score per document: weighted blend of stopword "
    "ratio (fluency proxy), alphabetic-character ratio (noise proxy), and "
    "a capped length credit -- the standard cheap pre-filter before "
    "expensive model-based scoring in a training-data pipeline. Per-row "
    "arithmetic over exact integer counts; identical formula in the "
    "oracle, so the doubles are bit-equal.",
    tags=("text", "llm-data"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    t = _toks()
    c = docs.select(
        "doc_id",
        F.length("text").alias("char_cnt"),
        F.size(t).alias("token_cnt"),
        F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).alias("stop_cnt"),
        F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z]', 0)")).alias("alpha_cnt"),
    )
    stop_ratio = F.col("stop_cnt").cast("double") / F.col("token_cnt")
    alpha_ratio = F.col("alpha_cnt").cast("double") / F.col("char_cnt")
    length_credit = F.least(F.col("token_cnt"), F.lit(100)).cast("double") / 100
    return c.select(
        "doc_id",
        F.when(F.col("token_cnt") > 0, stop_ratio).alias("stop_ratio"),
        F.when(F.col("char_cnt") > 0, alpha_ratio).alias("alpha_ratio"),
        F.when(
            (F.col("token_cnt") > 0) & (F.col("char_cnt") > 0),
            stop_ratio * 0.3 + alpha_ratio * 0.4 + length_credit * 0.3,
        ).alias("quality_score"),
    )


@register(
    "text_langid",
    oracle=r"""
        SELECT doc_id, lang,
               CASE WHEN len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) > 0
                         THEN 'zh'
                    WHEN len(regexp_extract_all(text, '[äöüß]')) > 0 THEN 'de'
                    WHEN len(regexp_extract_all(text, '[ñ¿¡]')) > 0 THEN 'es'
                    WHEN len(regexp_extract_all(text, '[çœàèù]')) > 0 THEN 'fr'
                    WHEN len(regexp_extract_all(text, '[A-Za-z]')) > 0 THEN 'en'
                    ELSE 'und' END AS pred_lang,
               (CASE WHEN len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) > 0
                          THEN 'zh'
                     WHEN len(regexp_extract_all(text, '[äöüß]')) > 0 THEN 'de'
                     WHEN len(regexp_extract_all(text, '[ñ¿¡]')) > 0 THEN 'es'
                     WHEN len(regexp_extract_all(text, '[çœàèù]')) > 0 THEN 'fr'
                     WHEN len(regexp_extract_all(text, '[A-Za-z]')) > 0 THEN 'en'
                     ELSE 'und' END = lang) AS is_match
        FROM documents
    """,
    doc="Script/diacritic language identification: CJK codepoints -> zh, "
    "language-specific diacritics -> de/es/fr, Latin fallback -> en. "
    "Deterministic first-match priority chain; emits the stored lang label "
    "alongside for accuracy auditing. (The synthetic corpus is pure-ASCII "
    "English regardless of its lang column, so pred_lang is 'en' "
    "throughout -- the operator shape, a per-row codegen'd regexp chain "
    "with zero shuffle, is the deliverable.) A real deployment swaps the "
    "priority chain for an n-gram frequency model; the plumbing is "
    "identical.",
    tags=("text", "llm-data"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")

    def _hits(pat: str) -> Column:
        return F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)")) > 0

    pred = (
        F.when(_hits(r"[\\u4E00-\\u9FFF]"), "zh")
        .when(_hits("[äöüß]"), "de")
        .when(_hits("[ñ¿¡]"), "es")
        .when(_hits("[çœàèù]"), "fr")
        .when(_hits("[A-Za-z]"), "en")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("is_match"),
    )


@register(
    "text_token_bpe",
    oracle=r"""
        WITH tc AS (
            SELECT source,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                       AS bpe_tokens
            FROM documents)
        SELECT source,
               COUNT(*) AS doc_cnt,
               CAST(SUM(bpe_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(bpe_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc
        FROM tc GROUP BY source
    """,
    doc="BPE-style pre-tokenizer counting: alpha runs / single digits / "
    "single non-alnum symbols (the GPT-2 pre-tokenizer's coarse shape), "
    "aggregated per source. The per-row count is codegen'd regexp work; "
    "the rollup is one map-side-combinable groupBy on a low-cardinality "
    "key -- token-budget accounting at corpus scale.",
    tags=("text", "llm-data"),
)
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bpe = F.size(
        F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)")
    )
    return (
        docs.select("source", bpe.alias("bpe_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("doc_cnt"),
            F.sum("bpe_tokens").alias("total_tokens"),
            (F.sum("bpe_tokens").cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens_per_doc"
            ),
        )
    )


@register(
    "text_fingerprint",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
            FROM documents)
        SELECT doc_id,
               CASE WHEN len(t) >= 4 THEN
                   list_min(list_transform(range(len(t) - 3),
                       i -> md5(t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                                || ' ' || t[i+4])))
               ELSE NULL END AS fingerprint
        FROM toks
    """,
    doc="Rolling-hash document fingerprint (winnowing-lite): md5 over each "
    "word 4-gram, keep the lexicographic minimum as the doc's fingerprint "
    "-- identical docs (and docs sharing their minimal 4-gram) collide. "
    "All array work happens per-row inside codegen (transform + array_min "
    "over the token array); no explode, no shuffle -- at 100 TB the "
    "fingerprint column costs one scan.",
    tags=("text", "llm-data"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    t = F.split(F.expr(r"trim(regexp_replace(lower(text), '\\s+', ' '))"), " ")
    fp = F.array_min(
        F.expr(
            "transform(sequence(0, size(t) - 4),"
            " i -> md5(encode(concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]),"
            " 'UTF-8')))"
        )
    )
    return docs.select("doc_id", t.alias("t")).select(
        "doc_id",
        F.when(F.size("t") >= 4, fp).alias("fingerprint"),
    )
