"""Per-term attribution of the doc_lm stage at scale (r13, VERDICT r12
task 4).

doc_lm is the DAG's #2 stage by 4M wall after the r12 round closed sem
and quality (159.6s, exponent 1.03, SCALING.md r12 table) and has never
had the per-term split. The stage is
``train_bigram_lm_grouped`` + ``lm_score_docs_grouped``
(queries/text.py): two count shuffles over exploded token/bigram
streams, the model-side log-prob precompute, the score-side stream
explode + three broadcast probes + one decimal groupBy(doc_id), and
the tail-cutoff percentile. This tool walls each term over the same
checkpointed corpus with the xxhash64-fold forcing trick
(quality_attrib's lesson: a bare count() lets Spark prune every
projected column and "measure" nothing). Terms:

- scan_toks_s:  widen scan + tokenize + explode tokens (the row floor
                every other term pays on top of)
- stream_s:     score-side bigram-struct explode (tokenize + the
                _BIGRAMS transform; no joins)
- train_uni_s:  unigram count table (explode + combinable groupBy)
- train_bi_s:   bigram count table (explode + combinable groupBy)
- model_lp_s:   the three log-prob tiers precomputed on the
                corpus-SUBLINEAR model tables (uni/bi checkpointed
                first, so this is model arithmetic alone)
- score_s:      lm_score_docs_grouped over CHECKPOINTED model tables
                (stream + three broadcast probes + decimal agg --
                the stage's scoring half, training excluded)
- cutoff_s:     lm_tail_cutoffs percentile over the CHECKPOINTED
                scored frame
- composed_s:   train + score end to end, forced once (the in-DAG
                stage shape minus the boundary write)

    python tools/lm_attrib.py <n_docs> [corpus_dir]

Corpus via dfcap_sweep.ensure_corpus (persistent dir reuse). Output:
one JSON line, terms in seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    N_DOCS = int(sys.argv[1])
    CORPUS_DIR = sys.argv[2] if len(sys.argv) > 2 else None

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()

    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        lm_tail_cutoffs,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        _BIGRAMS,
        _toks,
        lm_score_docs_grouped,
        train_bigram_lm_grouped,
    )

    own_tmp = None
    if CORPUS_DIR is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = CORPUS_DIR
    ensure_corpus(spark, sf_dir, N_DOCS)

    out = {"n_docs": N_DOCS}
    docs = (
        read_table(spark, sf_dir, "documents", widen=True)
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=True)
    )

    def force(df):
        df.select(
            F.sum(F.xxhash64(*df.columns).cast("double")).alias("h")
        ).collect()

    def term(name, df):
        t0 = time.time()
        force(df)
        out[name] = round(time.time() - t0, 1)

    # row floor: tokenize + token explode (every term repays this scan)
    term(
        "scan_toks_s",
        docs.select("doc_id", F.explode(_toks()).alias("w")),
    )
    # score-side stream: tokenize + bigram-struct transform + explode
    term(
        "stream_s",
        docs.where(F.col("lang").isNotNull())
        .select("doc_id", F.col("lang").alias("g"), _toks().alias("t"))
        .select("doc_id", "g", F.explode(F.expr(_BIGRAMS)).alias("b"))
        .select("doc_id", "g", "b.w1", "b.w2"),
    )
    # training counts, each on its own
    uni, bi, totals = train_bigram_lm_grouped(docs)
    term("train_uni_s", uni)
    term("train_bi_s", bi)
    # checkpointed model tables isolate the scoring half
    t0 = time.time()
    uni_c = uni.localCheckpoint(eager=True)
    bi_c = bi.localCheckpoint(eager=True)
    totals_c = totals.localCheckpoint(eager=True)
    out["train_ckpt_s"] = round(time.time() - t0, 1)
    out["model_rows"] = {
        "uni": uni_c.count(),
        "bi": bi_c.count(),
        "groups": totals_c.count(),
    }
    # model-side log-prob precompute alone (corpus-sublinear arithmetic)
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        LM_ALPHA,
        LM_LAMBDA,
    )

    lam = float(LM_LAMBDA)
    alpha = float(LM_ALPHA)
    denom = F.col("n").cast("double") + F.lit(alpha) * F.col("v").cast(
        "double"
    )
    c1 = uni_c.select("g", F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni_c.select("g", F.col("w").alias("w2"), F.col("c").alias("c2"))
    p_uni = (
        F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(alpha)
    ) / denom
    p_bi = F.when(
        F.col("c1").isNotNull() & (F.col("c1") != 0),
        F.col("c12").cast("double") / F.col("c1").cast("double"),
    ).otherwise(F.lit(0.0))
    term(
        "model_lp_s",
        bi_c.join(c1, ["g", "w1"], "left")
        .join(c2, ["g", "w2"], "left")
        .join(totals_c, "g", "left")
        .select(
            "g",
            "w1",
            "w2",
            F.log(F.lit(lam) * p_bi + F.lit(1 - lam) * p_uni).alias("lp"),
        ),
    )
    # stream + model probes + coalesce WITHOUT the per-doc aggregation
    # (score_s minus this is the decimal groupBy's own share)
    lp_pair = (
        bi_c.join(c1, ["g", "w1"], "left")
        .join(c2, ["g", "w2"], "left")
        .join(totals_c, "g", "left")
        .select(
            "g",
            "w1",
            "w2",
            F.log(F.lit(lam) * p_bi + F.lit(1 - lam) * p_uni).alias(
                "lp_pair"
            ),
        )
    )
    lp_w2 = c2.join(totals_c, "g", "left").select(
        "g",
        "w2",
        F.log(
            F.lit(lam) * F.lit(0.0) + F.lit(1 - lam) * p_uni
        ).alias("lp_w2"),
    )
    lp_oov = totals_c.select(
        "g",
        F.log(
            F.lit(lam) * F.lit(0.0)
            + F.lit(1 - lam)
            * ((F.lit(0).cast("double") + F.lit(alpha)) / denom)
        ).alias("lp_oov"),
    )
    stream = (
        docs.where(F.col("lang").isNotNull())
        .select("doc_id", F.col("lang").alias("g"), _toks().alias("t"))
        .select("doc_id", "g", F.explode(F.expr(_BIGRAMS)).alias("b"))
        .select("doc_id", "g", "b.w1", "b.w2")
    )
    term(
        "stream_joined_s",
        stream.join(F.broadcast(lp_pair), ["g", "w1", "w2"], "left")
        .join(F.broadcast(lp_w2), ["g", "w2"], "left")
        .join(F.broadcast(lp_oov), "g", "left")
        .select(
            "doc_id",
            F.coalesce("lp_pair", "lp_w2", "lp_oov").alias("lp"),
        ),
    )
    # scoring half over the pinned model (twice: the first call in a
    # session pays Python-worker spin-up + model-broadcast shipping;
    # the repeat is the steady-state wall)
    scored = lm_score_docs_grouped(docs, uni_c, bi_c, totals_c)
    term("score_s", scored)
    term(
        "score_repeat_s",
        lm_score_docs_grouped(docs, uni_c, bi_c, totals_c),
    )
    scored_c = scored.localCheckpoint(eager=True)
    term("cutoff_s", lm_tail_cutoffs(scored_c))
    # the composed stage, cold lineage end to end
    u2, b2, t2 = train_bigram_lm_grouped(docs)
    term("composed_s", lm_score_docs_grouped(docs, u2, b2, t2))
    print(json.dumps(out))
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


if __name__ == "__main__":
    main()
