"""Per-term attribution of sim_ann_family's Arrow kernels (r16).

VERDICT r15 #4: the family's corpus-sized interpreted HOF folds --
LSH bucket assignment, q8 quantization, the q8 integer retrieve dot,
the ivf/lsh pair cosine, the blocked pairs fold -- were kernelized
behind ANN_KERNEL_BOUND. This tool measures each term BOTH ways on a
synthetic at-scale embeddings corpus (deterministic numpy RNG, 64-dim
float32, ~N/250 labels -- the semdedup cell-sizing regime, so the
pairs branch's in-cell quadratic stays bounded), noop sink, warm
session, min over reps.

    python tools/ann_attrib.py <n_vecs> <corpus_dir> [reps] [term]

``term`` limits the run (bucket|quantize|q8|scored|pairs|family);
default all.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EMB_DIM = 64


def ensure_embeddings(sf_dir: str, n: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(path):
        found = pq.ParquetFile(path).metadata.num_rows
        if found != n:
            raise SystemExit(
                f"{sf_dir} holds {found} vectors, not {n}: use its own dir"
            )
        return
    os.makedirs(sf_dir, exist_ok=True)
    labels_card = max(4, n // 250)
    rng = np.random.default_rng(20260816)
    writer = None
    tmp = path + ".tmp"
    step = 250_000
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        m = hi - lo
        emb = rng.standard_normal((m, EMB_DIM)).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(range(lo, hi), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1), pa.float32()), EMB_DIM
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(
                    (rng.integers(0, labels_card, m)).astype("int32"),
                    pa.int32(),
                ),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(tmp, t.schema)
        writer.write_table(t)
    writer.close()
    os.rename(tmp, path)


def main() -> None:
    from pyspark.sql import functions as F

    from tools.bench_profile import noop, timed
    from tools.dfcap_sweep import make_session

    n = int(sys.argv[1])
    sf_dir = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    term = sys.argv[4] if len(sys.argv) > 4 else "all"
    ensure_embeddings(sf_dir, n)

    spark = make_session()
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import (
        similarity as S,
    )

    out: dict = {"n_vecs": n, "reps": reps}
    emb_n = S._normed(spark, sf_dir)
    noop(emb_n)  # populate the shared pin outside the timings

    if term in ("all", "bucket"):
        timed(
            spark, "bucket expr",
            lambda: emb_n.withColumn("bucket", S._bucket_col()),
            reps, out,
        )
        timed(
            spark, "bucket kernel",
            lambda: S._bucket_assign_kernel(emb_n), reps, out,
        )

    def quant_expr():
        mx = F.array_max(
            F.transform(
                F.col("embedding"), lambda x: F.abs(x.cast("double"))
            )
        )
        scl = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
        inv = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(0.0))
        return emb_n.select(
            "vec_id",
            F.zip_with(
                F.col("embedding"),
                F.array_repeat(scl, F.size(F.col("embedding"))),
                lambda x, s: F.floor(
                    x.cast("double") * s + F.lit(0.5)
                ).cast("bigint"),
            ).alias("qv"),
            inv.alias("inv"),
        )

    if term in ("all", "quantize"):
        timed(spark, "quantize expr", quant_expr, reps, out)
        timed(
            spark, "quantize kernel",
            lambda: S._quantize_kernel(emb_n), reps, out,
        )

    if term in ("all", "q8"):
        timed(
            spark, "q8 branch expr",
            lambda: S._quantized_rerank_scored(emb_n, kernel=False),
            reps, out,
        )
        timed(
            spark, "q8 branch kernel",
            lambda: S._quantized_rerank_scored(emb_n, kernel=True),
            reps, out,
        )

    def multiplexed(kernel: bool):
        b = (
            S._bucket_assign_kernel(emb_n)
            if kernel
            else emb_n.withColumn("bucket", S._bucket_col())
        )
        cand = b.select(
            "vec_id", "embedding", "nrm",
            F.explode(F.array(
                F.struct(
                    F.lit("ivf").alias("method"),
                    F.col("label").cast("long").alias("key"),
                ),
                F.struct(
                    F.lit("lsh").alias("method"),
                    F.col("bucket").cast("long").alias("key"),
                ),
            )).alias("mk"),
        ).select("vec_id", "embedding", "nrm", "mk.method", "mk.key")
        q = cand.where(F.col("vec_id") < S.QUERY_N).select(
            F.col("method").alias("q_method"), F.col("key").alias("q_key"),
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        joined = cand.join(
            F.broadcast(q),
            (F.col("method") == F.col("q_method"))
            & (F.col("key") == F.col("q_key"))
            & (F.col("vec_id") != F.col("id_a")),
        )
        if kernel:
            return S._pair_cosine_map(
                joined.select(
                    "method", "id_a", F.col("vec_id").alias("id_b"),
                    "q_emb", "embedding", "q_nrm", "nrm",
                )
            )
        return joined.select(
            "method", "id_a", F.col("vec_id").alias("id_b"),
            (
                S.dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )

    if term in ("all", "scored"):
        timed(
            spark, "ivf+lsh scored expr",
            lambda: multiplexed(False), reps, out,
        )
        timed(
            spark, "ivf+lsh scored kernel",
            lambda: multiplexed(True), reps, out,
        )

    if term in ("all", "pairs"):
        timed(
            spark, "pairs join",
            lambda: S.blocked_cell_pairs(emb_n), reps, out,
        )
        timed(
            spark, "pairs kernel",
            lambda: S.blocked_cell_pairs(emb_n, kernel=True), reps, out,
        )

    if term in ("all", "kseed"):
        from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
            _dist2,
        )

        valid = emb_n.where(
            F.col("vec_id").isNotNull()
            & F.col("embedding").isNotNull()
            & (F.size("embedding") == EMB_DIM)
        )
        seeds = (
            valid.select(
                F.md5(F.col("vec_id").cast("string")).alias("h"),
                "vec_id", "embedding",
            )
            .orderBy("h", "vec_id")
            .limit(S.KSEED_K)
            .collect()
        )

        def kseed_assign():
            choices = F.array(
                *[
                    F.struct(
                        _dist2(
                            F.col("embedding"),
                            [float(x) for x in r["embedding"]],
                        ).alias("d"),
                        F.lit(i).alias("cid"),
                    )
                    for i, r in enumerate(seeds)
                ]
            )
            best = F.array_min(choices)
            return valid.select(
                F.col("vec_id").alias("id_a"),
                best["cid"].cast("bigint").alias("id_b"),
                best["d"].alias("cosine"),
            )

        timed(spark, "kseed assign expr", kseed_assign, reps, out)

    if term in ("all", "pq"):
        from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.pq import (
            adc_scored, pq_encode,
        )

        nanfree = emb_n.where(
            F.col("vec_id").isNotNull()
            & F.col("embedding").isNotNull()
            & (F.size("embedding") == EMB_DIM)
            & ~F.exists(
                F.col("embedding"), lambda x: F.isnan(x.cast("double"))
            )
        )
        seed_rows = (
            nanfree.select(
                F.md5(F.col("vec_id").cast("string")).alias("h"),
                "vec_id", "embedding",
            )
            .orderBy("h", "vec_id")
            .limit(S.PQ_K)
            .collect()
        )
        books = {
            ss: {
                c: [
                    float(x)
                    for x in row["embedding"][
                        ss * S.PQ_DSUB : (ss + 1) * S.PQ_DSUB
                    ]
                ]
                for c, row in enumerate(seed_rows)
            }
            for ss in range(S.PQ_M)
        }
        from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.pq import (
            adc_scored_kernel, pq_encode_kernel,
        )

        timed(
            spark, "pq encode expr",
            lambda: pq_encode(nanfree, books).where(
                F.col("codes").isNotNull()
            ).select("vec_id", "codes"),
            reps, out,
        )
        timed(
            spark, "pq encode kernel",
            lambda: pq_encode_kernel(nanfree, books), reps, out,
        )
        coded = (
            pq_encode(nanfree, books)
            .where(F.col("codes").isNotNull())
            .select(F.col("vec_id").alias("id_b"), "codes")
            .localCheckpoint(eager=True)
        )
        qframe = nanfree.where(F.col("vec_id") < S.QUERY_N).select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        timed(
            spark, "pq adc expr",
            lambda: adc_scored(
                coded, qframe, books, F.col("id_b") != F.col("id_a")
            ),
            reps, out,
        )
        import math

        qtup = []
        for r in sorted(
            nanfree.where(F.col("vec_id") < S.QUERY_N).collect(),
            key=lambda r: r["vec_id"],
        ):
            acc = 0.0
            for v in r["embedding"]:
                fv = float(v)
                acc += fv * fv
            qtup.append((r["vec_id"], list(r["embedding"]), math.sqrt(acc)))
        timed(
            spark, "pq adc kernel",
            lambda: adc_scored_kernel(coded, qtup, books), reps, out,
        )
        coded.unpersist()

    if term in ("all", "family"):
        bound = S.ANN_KERNEL_BOUND
        try:
            S.ANN_KERNEL_BOUND = 1 << 60  # force expression path
            timed(
                spark, "family expr",
                lambda: S.sim_ann_family(spark, sf_dir), reps, out,
            )
            S.ANN_KERNEL_BOUND = -1  # force kernels (probe still applies)
            timed(
                spark, "family kernel",
                lambda: S.sim_ann_family(spark, sf_dir), reps, out,
            )
        finally:
            S.ANN_KERNEL_BOUND = bound

    print(json.dumps(out))
    S.release_normed_corpus(spark)
    spark.stop()


if __name__ == "__main__":
    main()
