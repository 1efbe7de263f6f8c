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
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    n_docs = int(sys.argv[1])
    corpus_dir = sys.argv[2] if len(sys.argv) > 2 else None

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.graph import (
        connected_components,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import dedup

    own_tmp = None
    if corpus_dir is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = corpus_dir
    ensure_corpus(spark, sf_dir, n_docs)

    out: dict = {"n_docs": n_docs}

    t0 = time.time()
    sh = dedup.shingled_docs(spark, sf_dir)
    out["index_rows"] = sh.count()  # builds + persists the index
    out["index_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    rep_map = dedup._digest_rep_map(spark, sf_dir, sh).localCheckpoint(
        eager=True
    )
    out["rep_map_s"] = round(time.time() - t0, 1)
    # the rep-filtered index is its OWN term: this materialization is a
    # full pass over the ~N*55 shingle rows, and the composed operator
    # keeps rep_sh lazy over the persisted index -- so the tool's later
    # terms read a pre-materialized frame the composed run never has
    # (round-10 review; the composed_s total is the honest end-to-end)
    t0 = time.time()
    rep_sh = sh.join(
        rep_map.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=True)
    out["rep_filter_s"] = round(time.time() - t0, 1)

    lsh = n_docs > dedup.LEXICAL_LSH_BOUND
    out["path"] = "lsh" if lsh else "direct"
    t0 = time.time()
    if lsh:
        cand = dedup._minhash_candidates(rep_sh).localCheckpoint(eager=True)
        out["candidates"] = cand.count()
        out["candidates_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        pairs = dedup._verify_candidates(rep_sh, cand).localCheckpoint(
            eager=True
        )
    else:
        pairs = dedup._pair_jaccard(rep_sh).localCheckpoint(eager=True)
    out["pairs"] = pairs.count()
    out["verify_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    labels = connected_components(pairs.select("doc_a", "doc_b"))
    out["labeled"] = labels.count()
    out["cc_s"] = round(time.time() - t0, 1)

    # composed operator end-to-end (warm index; the residual over the
    # terms is the label fold + sizes + canonical assembly)
    t0 = time.time()
    out["rows"] = dedup.lexical_components(spark, sf_dir).count()
    out["composed_s"] = round(time.time() - t0, 1)

    print(json.dumps(out))
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
