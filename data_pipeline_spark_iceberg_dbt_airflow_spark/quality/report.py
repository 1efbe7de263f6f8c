"""Corpus report card: the per-source health summary a curation run
reads FIRST -- before deciding mixtures, gates, or whether to ingest a
refresh at all.

One row per source, composing the existing operators (nothing here adds
semantics): document and token volume from the text profile, mean
heuristic quality, perplexity median/p95 under the per-language LM,
how many of the source's documents sit in near-dup clusters, and how
many are benchmark-contaminated. Every input is an already-bounded
aggregate or pair set, so the report costs a handful of small joins on
doc_id -- at 100 TB it is the dashboards query over materialized stage
outputs, not a new scan of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..queries.dedup import contaminated_docs, shingled_docs
from ..queries.text import (
    lm_score_docs_grouped,
    text_profile,
    train_bigram_lm_grouped,
)


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, total_tokens, mean_quality, ppl_p50, ppl_p95,
    n_neardup, n_contaminated) -- one row per source, sorted by source."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    profile = text_profile(spark, sf_dir).select(
        "doc_id", "bpe_tokens", "quality_score"
    )
    uni, bi, totals = train_bigram_lm_grouped(docs)
    lm = lm_score_docs_grouped(docs, uni, bi, totals).select(
        "doc_id", "cross_entropy"
    )
    sh = shingled_docs(spark, sf_dir)
    from ..queries.dedup import _pair_jaccard

    dup_docs = (
        _pair_jaccard(sh)
        .select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    contam = (
        contaminated_docs(sh)
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(1))
    )
    joined = (
        docs.select("doc_id", "source")
        .join(profile, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .join(dup_docs, "doc_id", "left")
        .join(contam, "doc_id", "left")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe_tokens").alias("total_tokens"),
            F.avg("quality_score").alias("mean_quality"),
            F.percentile("cross_entropy", 0.5).alias("ppl_p50_ce"),
            F.percentile("cross_entropy", 0.95).alias("ppl_p95_ce"),
            F.count_if(F.col("is_dup").isNotNull()).alias("n_neardup"),
            F.count_if(F.col("is_contam").isNotNull()).alias(
                "n_contaminated"
            ),
        )
        .orderBy("source")
    )
