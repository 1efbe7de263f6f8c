"""Component-level timing of the expensive bench queries (guide §1).

    python tools/bench_profile.py <probe> [reps]

Each probe isolates one component of a headline query with the noop
sink (df.write.format('noop') -- computes every column, discards the
write), warm session, min over reps (default 3). Probes:

  ann_branches   sim_ann_family split per method branch
  neardup        dedup_neardup_verified split (index / pair / minhash)
  span           dedup_span_mask split (occ explode / frequent / full)
  query:<name>   any registry query end-to-end via the noop sink
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.session import get_spark_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, build, reps, out, warm=True):
    """min-of-reps noop-sink wall for the frame ``build()`` returns."""
    spark.sparkContext.setJobDescription(label)
    if warm:
        noop(build())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        noop(build())
        best = min(best, time.perf_counter() - t0)
    out[label] = round(best, 4)
    spark.sparkContext.setJobDescription(None)


def ann_branches(spark, reps, out):
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import similarity as S

    emb_n = S._normed(spark, SF_DIR)
    noop(emb_n)  # populate the shared pin outside the timings

    def multiplexed():
        b = emb_n.withColumn("bucket", S._bucket_col())
        cand = b.select(
            "vec_id", "embedding", "nrm",
            F.explode(F.array(
                F.struct(F.lit("ivf").alias("method"), F.col("label").cast("long").alias("key")),
                F.struct(F.lit("lsh").alias("method"), F.col("bucket").cast("long").alias("key")),
            )).alias("mk"),
        ).select("vec_id", "embedding", "nrm", "mk.method", "mk.key")
        q = cand.where(F.col("vec_id") < S.QUERY_N).select(
            F.col("method").alias("q_method"), F.col("key").alias("q_key"),
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        return cand.join(
            F.broadcast(q),
            (F.col("method") == F.col("q_method"))
            & (F.col("key") == F.col("q_key"))
            & (F.col("vec_id") != F.col("id_a")),
        ).select(
            "method", "id_a", F.col("vec_id").alias("id_b"),
            (S.dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias("cosine"),
        )

    timed(spark, "ivf+lsh scored", multiplexed, reps, out)
    timed(spark, "q8 scored", lambda: S._quantized_rerank_scored(emb_n), reps, out)
    timed(spark, "pairs blocked", lambda: S.blocked_cell_pairs(emb_n), reps, out)
    timed(
        spark, "pairs kernel",
        lambda: S.blocked_cell_pairs(emb_n, kernel=True), reps, out,
    )
    timed(spark, "full family", lambda: S.sim_ann_family(spark, SF_DIR), reps, out)


def neardup(spark, reps, out):
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import dedup as D

    def cold_index():
        D.release_shingle_index(spark)
        return D.shingled_docs(spark, SF_DIR)

    timed(spark, "index cold", cold_index, reps, out)
    sh = D.shingled_docs(spark, SF_DIR)
    noop(sh)  # warm the pin
    timed(spark, "pair_jaccard warm", lambda: D._pair_jaccard(sh), reps, out)
    timed(spark, "minhash cand warm", lambda: D._minhash_candidates(sh), reps, out)

    def full():
        D.release_shingle_index(spark)
        return D.dedup_neardup_verified(spark, SF_DIR)

    timed(spark, "full cold", full, reps, out)


def span(spark, reps, out):
    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import dedup as D

    docs = read_table(spark, SF_DIR, "documents", widen=True).select("doc_id", "text")
    window = D.LINE_TOKENS
    case_tokens = F.split(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " ")
    with_toks = docs.withColumn("wt", case_tokens)

    def occ_expr():
        return D._span_occ_expr(with_toks, window)

    timed(spark, "occ explode expr", occ_expr, reps, out)
    if hasattr(D, "_span_occ_kernel"):
        timed(
            spark, "occ explode kernel",
            lambda: D._span_occ_kernel(docs, window), reps, out,
        )
    timed(
        spark, "frequent agg",
        lambda: occ_expr()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"), F.min(F.struct("doc_id", "pos")).alias("first"))
        .where(F.col("c") >= D.LINE_MIN_DUP),
        reps, out,
    )
    timed(
        spark, "full mask",
        lambda: D.mask_repeated_spans(docs).where(F.col("masked_tokens") > 0),
        reps, out,
    )


def main() -> None:
    probe = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark_session("bench-profile")
    out: dict = {"probe": probe, "sf_dir": SF_DIR}
    if probe == "ann_branches":
        ann_branches(spark, reps, out)
    elif probe == "neardup":
        neardup(spark, reps, out)
    elif probe == "span":
        span(spark, reps, out)
    elif probe.startswith("query:"):
        from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries

        name = probe.split(":", 1)[1]
        spec = all_queries()[name]
        timed(spark, name, lambda: spec.spark_fn(spark, SF_DIR), reps, out)
    else:
        raise SystemExit(f"unknown probe {probe!r}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
