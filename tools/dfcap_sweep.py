"""DF_CAP sensitivity sweep for the lexical near-dup rung (SCALING.md).

DF_CAP is the stop-shingle document-frequency bound (queries/dedup.py):
the ONE knob bounding the inverted-index pair join's quadratic band --
a shingle shared by df docs emits ~df^2/2 candidate pairs, so the join
cost is sum(df^2) over surviving shingles, capped at DF_CAP^2 per
shingle. Smaller caps bound the band harder but drop more TRUE pairs
(a near-dup pair whose every shared shingle is corpus-hot becomes
invisible). This tool measures both sides on the curation stress
corpus (tools/curation_stress.make_corpus -- planted one-token-off
near-copies give exact ground truth) so the cap choice rule in
SCALING.md is a number, not a guess.

One (cap, path) per invocation -- fresh JVM, clean timing, and
DF_CAP/_LSH bound both bake into module state at build:

    python tools/dfcap_sweep.py <n_docs> <df_cap> <direct|lsh> [corpus_dir]

Emits one JSON line: stage walls (shingle build, pair generation,
full lexical_components), surviving pair count, and planted-pair
recall (near-copy pairs clustered together / planted). ``corpus_dir``
(optional) reuses a corpus written by a prior invocation (written
there on first use) so the sweep doesn't re-synthesize 1M docs per
point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_session(extra_conf: dict | None = None):
    """The one Spark session builder every stress/sweep tool shares:
    local[SPARK_GRAFT_CPUS] (default 32), 32 shuffle partitions,
    SPARK_GRAFT_DRIVER_MEM (default 16g) -- four tools used to carry
    copy-pasted builders that had already drifted (round-10 review).
    ``extra_conf`` layers tool-specific knobs (e.g. bucketed_delta's
    UI stage retention)."""
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_corpus(spark, sf_dir: str, n_docs: int) -> None:
    from tools.curation_stress import make_corpus

    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(path):
        # a reused corpus dir must actually hold n_docs, or the JSON
        # this tool emits silently mislabels the measurement
        import pyarrow.parquet as pq

        found = pq.ParquetFile(path).metadata.num_rows
        if found != n_docs:
            raise SystemExit(
                f"corpus dir {sf_dir} holds {found} docs, not the "
                f"requested {n_docs}: point each size at its own dir"
            )
        return
    os.makedirs(sf_dir, exist_ok=True)
    if n_docs > 2_000_000:
        # r13 (the 16M scale point): materializing the corpus as Python
        # tuples costs ~0.5 KB/doc of driver memory and a monolithic
        # createDataFrame pickle -- stream the IDENTICAL row sequence
        # (curation_stress.iter_corpus, same RNG) straight into one
        # parquet file in 500k-row groups instead. Same rows, no Spark
        # job, bounded memory.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tools.curation_stress import iter_corpus

        tmp = path + ".tmp"
        cols: dict = {
            "doc_id": [],
            "text": [],
            "lang": [],
            "source": [],
            "n_chars": [],
        }
        writer = None

        def flush():
            nonlocal writer
            if not cols["doc_id"]:
                return
            t = pa.table(
                {
                    "doc_id": pa.array(cols["doc_id"], pa.int64()),
                    "text": pa.array(cols["text"], pa.string()),
                    "lang": pa.array(cols["lang"], pa.string()),
                    "source": pa.array(cols["source"], pa.string()),
                    "n_chars": pa.array(cols["n_chars"], pa.int64()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(tmp, t.schema)
            writer.write_table(t)
            for v in cols.values():
                v.clear()

        for (doc_id, text, lang, source, n_chars), _ in iter_corpus(
            n_docs
        ):
            cols["doc_id"].append(doc_id)
            cols["text"].append(text)
            cols["lang"].append(lang)
            cols["source"].append(source)
            cols["n_chars"].append(n_chars)
            if len(cols["doc_id"]) >= 500_000:
                flush()
        flush()
        if writer is not None:
            writer.close()
        os.rename(tmp, path)
        return
    corpus, _ = make_corpus(n_docs)
    stage = os.path.join(sf_dir, "_stage")
    spark.createDataFrame(
        corpus,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    os.rename(
        os.path.join(stage, part), os.path.join(sf_dir, "documents.parquet")
    )


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    N_DOCS = int(sys.argv[1])
    CAP = int(sys.argv[2])
    PATH = sys.argv[3]
    CORPUS_DIR = sys.argv[4] if len(sys.argv) > 4 else None
    assert PATH in ("direct", "lsh"), PATH

    spark = make_session()

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import dedup

    dedup.DF_CAP = CAP
    # the sweep measures the ABSOLUTE cap: zero the ratio term so
    # df_cap_for cannot floor a downward sweep back up at big corpora
    # (r11: the effective cap is max(DF_CAP, ratio * N))
    dedup.DF_CAP_RATIO = 0.0
    # path selection via the corpus-size bound: 0 forces banded MinHash,
    # a huge bound forces the direct inverted-index join
    dedup.LEXICAL_LSH_BOUND = 0 if PATH == "lsh" else 10**12

    own_tmp = None
    if CORPUS_DIR is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = CORPUS_DIR
    ensure_corpus(spark, sf_dir, N_DOCS)

    t0 = time.time()
    sh = dedup.shingled_docs(spark, sf_dir)
    sh.count()  # materialize the persisted index
    t_shingle = time.time() - t0

    # pair generation exactly as the shipped stage runs it: over the
    # digest-collapsed representatives
    t0 = time.time()
    rep_map = dedup._digest_rep_map(spark, sf_dir, sh).localCheckpoint(
        eager=True
    )
    rep_sh = sh.join(
        rep_map.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
    )
    if PATH == "direct":
        n_pairs = dedup._pair_jaccard(rep_sh).count()
    else:
        n_pairs = dedup._verify_candidates(
            rep_sh, dedup._minhash_candidates(rep_sh)
        ).count()
    t_pairs = time.time() - t0

    t0 = time.time()
    lab = (
        dedup.lexical_components(spark, sf_dir)
        .select("doc_id", "cluster_id")
        .localCheckpoint(eager=True)
    )
    t_full = time.time() - t0

    # planted ground truth: doc i (i % 10 == 1, i > 0) is a one-token
    # near-copy of doc i-1 (tools/curation_stress.make_corpus); the
    # pair must land in one cluster. Exact-copy plants (i % 50 == 7)
    # are digest-collapsed Jaccard-1.0 cliques -- cap-independent by
    # construction -- so near-copy recall is the cap-sensitive number.
    pairs = (
        lab.alias("x")
        .join(
            lab.alias("y"),
            (F.col("x.doc_id") + 1 == F.col("y.doc_id"))
            & (F.col("y.doc_id") % 10 == 1),
        )
        .select(
            (F.col("x.cluster_id") == F.col("y.cluster_id")).alias("hit")
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("hit").cast("int")).alias("h")
    ).collect()[0]
    print(
        json.dumps(
            {
                "n_docs": N_DOCS,
                "df_cap": CAP,
                "path": PATH,
                "shingle_s": round(t_shingle, 1),
                "pairs_s": round(t_pairs, 1),
                "lexical_components_s": round(t_full, 1),
                "n_pairs": n_pairs,
                "planted": int(agg["n"]),
                "recalled": int(agg["h"]),
                "recall": round(agg["h"] / agg["n"], 4) if agg["n"] else None,
            }
        )
    )
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


if __name__ == "__main__":
    main()
