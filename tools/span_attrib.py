"""Per-term attribution of the span_deduped stage (mask_repeated_spans).

VERDICT r13 #3: span_deduped's in-DAG 4M reading regressed 170.8s (r12)
-> 253.9s (r13) with the operator's code unchanged, and got only an
"ambient band" explanation while doc_quality's similar move was
adjudicated same-day with an isolated run (tools/quality_attrib.py).
This is span's sibling: it times each term of
``queries/dedup.mask_repeated_spans`` over the same corpus with a
count() barrier per term, then the composed operator and its parquet
materialization -- all in a fresh session, no DAG around it. If the
isolated wall sits in the r12 band, the r13 in-DAG reading was ambient
I/O pressure (the 240s index write ran just upstream); if not, the
regression is real and the dominant term is named.

Terms:
- scan_tok   : scan + widen + tokenize + size guard (row-pass floor)
- digest     : stride-1 window md5 posexplode (the token-linear pass)
- frequent   : digest occurrence count + min-first struct (map-side
               combinable HashAggregate, corpus-sublinear output)
- flag_merge : frequent join-back + island merge windows (doc-keyed)
- composed   : full mask_repeated_spans, count barrier
- materialize: composed written to parquet (the stage's real shape)

    python tools/span_attrib.py <n_docs> [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n_docs = int(sys.argv[1])
    corpus_dir = sys.argv[2] if len(sys.argv) > 2 else None

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()

    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        LINE_MIN_DUP,
        LINE_TOKENS,
        mask_repeated_spans,
    )

    own_tmp = None
    if corpus_dir is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = corpus_dir
    ensure_corpus(spark, sf_dir, n_docs)

    out: dict = {"n_docs": n_docs, "window": LINE_TOKENS,
                 "min_dup": LINE_MIN_DUP}
    docs = read_table(spark, sf_dir, "documents", widen=True).select(
        "doc_id", "text"
    )

    case_tokens = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    with_toks = docs.withColumn("wt", case_tokens)

    t0 = time.time()
    out["docs"] = with_toks.select("doc_id", F.size("wt").alias("n")).where(
        F.col("n") >= 0
    ).count()
    out["scan_tok_s"] = round(time.time() - t0, 1)

    w = LINE_TOKENS
    # the SAME occ rendering the composed operator takes (r15: binary
    # digests; size-gated Arrow kernel above SPAN_KERNEL_BOUND)
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import (
        dedup as _dedup,
    )

    use_kernel = n_docs > _dedup.SPAN_KERNEL_BOUND and _dedup._kernel_locale_ok(
        spark
    )
    out["occ_path"] = "kernel" if use_kernel else "expr"
    occ = (
        _dedup._span_occ_kernel(docs, w)
        if use_kernel
        else _dedup._span_occ_expr(with_toks, w)
    )
    t0 = time.time()
    out["occ_rows"] = occ.count()
    out["digest_s"] = round(time.time() - t0, 1)

    frequent = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct("doc_id", "pos")).alias("first"),
        )
        .where(F.col("c") >= LINE_MIN_DUP)
    )
    t0 = time.time()
    out["frequent_rows"] = frequent.count()
    out["frequent_s"] = round(time.time() - t0, 1)

    freq_cols = frequent.select(
        "h",
        F.col("first.doc_id").alias("first_doc"),
        F.col("first.pos").alias("first_pos"),
    )
    flagged = occ.join(F.broadcast(freq_cols), "h").where(
        (F.col("doc_id") != F.col("first_doc"))
        | (F.col("pos") != F.col("first_pos"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    spans = flagged.select(
        "doc_id", "pos", (F.col("pos") + F.lit(w)).alias("end")
    )
    prev_max = F.max("end").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        spans.withColumn(
            "new_island",
            F.when(
                prev_max.isNull() | (F.col("pos") > prev_max), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
    )
    t0 = time.time()
    out["islands"] = islands.count()
    out["flag_merge_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    masked = mask_repeated_spans(docs)
    # a bare count() lets Spark PRUNE the rewritten text column (the
    # quality_attrib lesson) -- fold every column through xxhash64 so
    # the composed wall includes the rewrite
    row = masked.select(
        F.sum(F.xxhash64("doc_id", "text", "masked_tokens", "n_spans")
              .cast("double")).alias("x"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    out["masked_rows"] = row["n"]
    out["composed_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    tgt = os.path.join(tempfile.mkdtemp(), "span_attrib_out")
    mask_repeated_spans(docs).write.mode("overwrite").parquet(tgt)
    out["materialize_s"] = round(time.time() - t0, 1)

    if "--shuffle" in sys.argv:
        # r14: the frequent table at 4M is ~20.7M rows (~1GB
        # broadcast) -- cheap in one shared-heap local JVM, deadly on
        # a real cluster. Price the shuffle-join rendering
        # (broadcast_frequent=False) on the same corpus.
        t0 = time.time()
        m2 = mask_repeated_spans(docs, broadcast_frequent=False)
        row2 = m2.select(
            F.sum(
                F.xxhash64("doc_id", "text", "masked_tokens", "n_spans")
                .cast("double")
            ).alias("x"),
            F.count(F.lit(1)).alias("n"),
        ).head()
        out["composed_shuffle_s"] = round(time.time() - t0, 1)
        out["shuffle_rows"] = row2["n"]
        out["hash_equal"] = bool(row["x"] == row2["x"])

    print(json.dumps(out))
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


if __name__ == "__main__":
    main()
