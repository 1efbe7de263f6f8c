"""Per-term attribution of the lexical near-dup stage (SCALING.md).

`doc_clusters` is the curation DAG's largest non-semantic stage at 1M
(~77s); this tool splits it through the SAME building blocks
`queries/dedup.lexical_components` composes -- shingle index build,
digest-collapse rep map, banded-MinHash candidates, explicit
verification, connected components, the label folds -- with a
materialization barrier between terms, then runs the composed operator
for the total (the residual is the final size/canonical assembly).

    python tools/lexical_attrib.py <n_docs> [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    n_docs = int(sys.argv[1])
    corpus_dir = sys.argv[2] if len(sys.argv) > 2 else None

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.graph import (
        connected_components,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        bucket_count_for,
        write_bucketed,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import dedup

    def gc_nudge() -> None:
        # free dead shuffle generations between terms (the r14 recall
        # lesson: ContextCleaner only reclaims after a JVM GC)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    own_tmp = None
    if corpus_dir is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = corpus_dir
    ensure_corpus(spark, sf_dir, n_docs)

    n_buckets = bucket_count_for(n_docs)
    out: dict = {"n_docs": n_docs, "buckets": n_buckets}

    # r16 (VERDICT r15 #1): every heavy boundary is a DISK-BACKED
    # bucketed table read bare -- the production shape the composed DAG
    # uses above BUCKETED_DAG_BOUND -- instead of the in-memory
    # shingled_docs persist + 463M-row localCheckpoint that OOM'd the
    # 8M split in r15 (AGGREGATE_OUT_OF_MEMORY: the cache tiers stole
    # execution memory from the minhash aggregate).
    idx_tbl = "attrib_shingle_index"
    t0 = time.time()
    sh = dedup.materialize_shingle_index(spark, sf_dir, idx_tbl, n_buckets)
    out["index_rows"] = sh.count()
    out["index_s"] = round(time.time() - t0, 1)
    gc_nudge()

    # rep map is one row per shingle-bearing doc (~16 B/row) -- small
    # enough for a localCheckpoint at any corpus this box fits
    t0 = time.time()
    rep_map = dedup._digest_rep_map(spark, sf_dir, sh).localCheckpoint(
        eager=True
    )
    out["rep_map_s"] = round(time.time() - t0, 1)

    # the rep-filtered index is its own bucketed-table boundary, read
    # bare: the index side of the filter join stays in place (bucketed
    # scan), the rep ids shuffle to it, and downstream terms re-read
    # columnar disk instead of a cache tier
    rep_tbl = "attrib_rep_index"
    t0 = time.time()
    reps = rep_map.where(F.col("doc_id") == F.col("rep")).select("doc_id")
    write_bucketed(
        sh.join(reps, "doc_id", "left_semi"),
        rep_tbl,
        "doc_id",
        n_buckets,
        sort=True,
    )
    rep_sh = spark.table(rep_tbl)
    out["rep_rows"] = rep_sh.count()
    out["rep_filter_s"] = round(time.time() - t0, 1)
    gc_nudge()

    lsh = n_docs > dedup.LEXICAL_LSH_BOUND
    out["path"] = "lsh" if lsh else "direct"
    cand_dir = os.path.join(
        tempfile.gettempdir(), f"attrib_cand_{os.getpid()}"
    )
    t0 = time.time()
    if lsh:
        # candidate pairs are their own small disk boundary (two longs
        # a row), so the verify term starts from a parquet scan, not a
        # live shuffle lineage
        dedup._minhash_candidates(rep_sh).write.mode("overwrite").parquet(
            cand_dir
        )
        cand = spark.read.parquet(cand_dir)
        out["candidates"] = cand.count()
        out["candidates_s"] = round(time.time() - t0, 1)
        gc_nudge()
        t0 = time.time()
        pairs = dedup._verify_candidates(rep_sh, cand).localCheckpoint(
            eager=True
        )
    else:
        pairs = dedup._pair_jaccard(rep_sh).localCheckpoint(eager=True)
    out["pairs"] = pairs.count()
    out["verify_s"] = round(time.time() - t0, 1)
    gc_nudge()

    t0 = time.time()
    labels = connected_components(pairs.select("doc_a", "doc_b"))
    out["labeled"] = labels.count()
    out["cc_s"] = round(time.time() - t0, 1)
    gc_nudge()

    # composed operator end-to-end over the warm TABLE-BACKED index --
    # the DAG's production doc_clusters shape (the residual over the
    # terms is the label fold + sizes + canonical assembly)
    t0 = time.time()
    out["rows"] = dedup.lexical_components(spark, sf_dir).count()
    out["composed_s"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    spark.sql(f"DROP TABLE IF EXISTS {idx_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {rep_tbl}")
    import shutil

    shutil.rmtree(cand_dir, ignore_errors=True)
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


def buildwrite() -> None:
    """Attribute the shingle-index BUILD+WRITE line (r14, VERDICT r13
    #1: 240s at 4M, 525s at 16M -- the DAG's biggest single block).

        python tools/lexical_attrib.py --buildwrite <n_docs> <corpus_dir> \
            [legacy|fast|terms] [n_buckets]

    ``n_buckets`` defaults to the r15 corpus-scaled count
    (operators.layout.bucket_count_for); pass 32 to reproduce the
    r13/r14 fixed-count readings for an A/B.

    legacy : the r13 cold shape -- shingled_docs() persist-backed build,
             write_bucketed from the cache (the write action populates
             BOTH memory tiers, then the caller pops them).
    fast   : materialize_shingle_index's r14 cold path -- uncached
             lineage, pre-partitioned, one doc_id shuffle, no index
             cache populate.
    terms  : per-term split (kernel explode / df-cap agg / window /
             write) with materialization barriers, for attribution.

    Run each variant in its OWN process (fresh session, cold JVM) and
    compare walls; the emitted JSON carries the variant name.
    """
    from pyspark.sql import functions as F

    from tools.dfcap_sweep import ensure_corpus, make_session

    n_docs = int(sys.argv[2])
    sf_dir = sys.argv[3]
    variant = sys.argv[4] if len(sys.argv) > 4 else "fast"
    spark = make_session()
    ensure_corpus(spark, sf_dir, n_docs)

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        bucket_count_for,
        write_bucketed,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import dedup

    n_buckets = (
        int(sys.argv[5]) if len(sys.argv) > 5 else bucket_count_for(n_docs)
    )
    tbl = "attrib_shingle_index"
    out: dict = {"n_docs": n_docs, "variant": variant, "buckets": n_buckets}
    t0 = time.time()
    if variant == "legacy":
        idx = dedup.shingled_docs(spark, sf_dir)
        write_bucketed(idx, tbl, "doc_id", n_buckets, sort=True)
        out["rows"] = spark.table(tbl).count()
        out["wall_s"] = round(time.time() - t0, 1)
    elif variant == "fast":
        dedup.materialize_shingle_index(spark, sf_dir, tbl, n_buckets)
        out["rows"] = spark.table(tbl).count()
        out["wall_s"] = round(time.time() - t0, 1)
    elif variant == "terms":
        raw, _ = dedup._index_lineage(spark, sf_dir)
        out["raw_rows"] = raw.count()  # kernel explode + raw persist
        out["kernel_s"] = round(time.time() - t0, 1)
        n = n_docs
        cap = dedup.df_cap_for(n)
        t0 = time.time()
        drop = (
            raw.groupBy("sid")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > cap)
            .select("sid")
        )
        out["drop_sids"] = drop.count()
        out["dfcap_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        capped = raw.join(F.broadcast(drop), "sid", "left_anti")
        from pyspark.sql import Window

        win = capped.select(
            "doc_id",
            "sid",
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id"))
            .alias("n_sh"),
        )
        out["index_rows"] = win.count()
        out["window_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        write_bucketed(win, tbl, "doc_id", n_buckets, sort=True)
        out["write_s"] = round(time.time() - t0, 1)
    else:
        raise SystemExit(f"unknown variant {variant!r}")
    print(json.dumps(out))
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--buildwrite":
        buildwrite()
    else:
        main()
