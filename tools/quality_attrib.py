"""Per-term attribution of the doc_quality stage (text_profile) at scale.

VERDICT r11 task 2: doc_quality is the curation DAG's most expensive
stage at 4M (521.9s, exponent 0.88 but 3.4x the 1M wall in absolute
terms) and has never had the per-term split the lexical and semantic
stages got. This tool times each expression family of
``queries/text.text_profile`` separately over the same corpus, with a
count() barrier per term so each wall is one family's cost, then the
composed profile and its parquet materialization. Families:

- scan_ptext: scan + widen + synth_pii concat (the row-pass floor)
- tok_stats: \\S+ tokenize + counts/distinct/avg/stop ratio (HOF folds)
- regex_counts: punct/alpha/bpe regexp_extract_all families (codegen)
- lang_pred: the language-guess regex hits chain
- fingerprint: lower/normalize split + per-4gram md5 + array_min (HOF)
- rep_2gram: 2-gram build + array_sort + longest-run fold (HOF)
- pii: 4x regexp count + redaction chain + md5 (codegen regex)
- composed: the full text_profile (count barrier)
- materialize: full profile written to parquet (the stage's real shape)

    python tools/quality_attrib.py <n_docs> [corpus_dir]

Uses the same stress corpus builder as the other attribution tools.
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
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.pii import (
        PII_PATTERNS,
        pii_count,
        redact_pii,
        synth_pii,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        STOPWORDS,
        _toks,
        text_profile,
    )

    own_tmp = None
    if CORPUS_DIR is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = CORPUS_DIR
    ensure_corpus(spark, sf_dir, N_DOCS)

    out = {"n_docs": N_DOCS}
    docs = synth_pii(
        read_table(spark, sf_dir, "documents", widen=True)
    ).localCheckpoint(eager=True)

    def force(df):
        # count() lets Spark PRUNE every projected column (a bare count
        # measured the composed profile at 0.9s while one term alone
        # took 11s); an xxhash64 fold over every column forces full
        # evaluation for one extra cheap aggregate
        df.select(
            # double sum: ANSI long-sum overflows on 64-bit hashes
            F.sum(F.xxhash64(*df.columns).cast("double")).alias("h")
        ).collect()

    def term(name, df):
        t0 = time.time()
        force(df)
        out[name] = round(time.time() - t0, 1)

    t = _toks()
    token_cnt = F.size(t)
    char_cnt = F.length("text")
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
    )
    stop_cnt = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    term(
        "tok_stats_s",
        docs.select(
            token_cnt.alias("tc"),
            F.size(F.array_distinct(t)).alias("u"),
            sum_len.alias("sl"),
            stop_cnt.alias("sc"),
        ),
    )
    term(
        "regex_counts_s",
        docs.select(
            F.size(F.expr(r"regexp_extract_all(text, '[.,;:!?]', 0)")).alias("p"),
            F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z]', 0)")).alias("a"),
            F.size(
                F.expr(
                    r"regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)"
                )
            ).alias("b"),
        ),
    )

    def _hits(pat: str):
        return F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)")) > 0

    pred = (
        F.when(_hits(r"[\\u4E00-\\u9FFF]"), "zh")
        .when(_hits("[äöüß]"), "de")
        .when(_hits("[ñ¿¡]"), "es")
        .when(_hits("[çœàèù]"), "fr")
        .when(F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z]', 0)")) > 0, "en")
        .otherwise("und")
    )
    term("lang_pred_s", docs.select(pred.alias("pl")))

    wt = F.split(F.expr(r"trim(regexp_replace(lower(text), '\\s+', ' '))"), " ")
    fp = F.array_min(
        F.expr(
            "transform(sequence(0, size(wt) - 4),"
            " i -> md5(encode(concat_ws(' ', wt[i], wt[i+1], wt[i+2], wt[i+3]),"
            " 'UTF-8')))"
        )
    )
    term(
        "fingerprint_s",
        docs.withColumn("wt", wt)
        .select(F.when(F.size("wt") >= 4, fp).alias("fp")),
    )

    g2 = F.expr(
        "transform(sequence(0, size(wt) - 2), i -> concat_ws(' ', wt[i], wt[i+1]))"
    )
    top2 = F.expr(
        "aggregate("
        " array_sort(g2),"
        " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
        " (acc, g) -> named_struct("
        "   'prev', g,"
        "   'run', IF(g <=> acc.prev, acc.run + 1, 1),"
        "   'best', GREATEST(acc.best, IF(g <=> acc.prev, acc.run + 1, 1))),"
        " acc -> acc.best)"
    )
    term(
        "rep_2gram_s",
        docs.withColumn("wt", wt)
        .withColumn("g2", g2)
        .select(
            F.when(F.size("wt") >= 2, top2.cast("double") / F.size("g2")).alias(
                "r"
            )
        ),
    )

    term(
        "pii_s",
        docs.select(
            *[
                pii_count(F.col("ptext"), n).alias(f"pii_{n}")
                for n, _, _ in PII_PATTERNS
            ],
            F.md5(F.encode(redact_pii(F.col("ptext")), "UTF-8")).alias("h"),
        ),
    )

    out["terms_total_s"] = round(
        sum(v for k, v in out.items() if k.endswith("_s")), 1
    )

    # explicit kernel-vs-expression A/B over the SAME checkpointed
    # ptext frame (r12: PROFILE_KERNEL): expression first so any
    # session warmup biases AGAINST the kernel's win
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        _profile_rows_expr,
        _profile_rows_kernel,
    )

    t0 = time.time()
    force(_profile_rows_expr(docs))
    out["composed_expr_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    force(_profile_rows_kernel(docs))
    out["composed_kernel_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    force(text_profile(spark, sf_dir))
    out["composed_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    dest = os.path.join(sf_dir, "_profile_out")
    text_profile(spark, sf_dir).write.mode("overwrite").parquet(dest)
    out["materialize_s"] = round(time.time() - t0, 1)
    import shutil

    shutil.rmtree(dest, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


if __name__ == "__main__":
    main()
