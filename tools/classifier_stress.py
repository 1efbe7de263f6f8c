"""Measure the learned quality gate's scale shape (SCALING.md evidence).

Claims under test (operators/classifier.py docstring):
- FIT cost is seed-set-sized: each round is one combinable dim+2-sum
  aggregate over the checkpointed (vector, label) seed frame, so wall
  per round should move sublinearly with |seed| at tool scale (job
  overhead dominates until the seed is huge).
- SCORING is corpus-sized and scan-shaped: the fitted weights inline
  as literals, sigmoid(w.x + b) is one codegen pass -- no join, no
  shuffle -- so wall should scale ~linearly with corpus rows.
- The gate GENERALIZES: trained on a small labeled seed, held-out
  accuracy on the planted two-vocabulary corpus should be ~100%.

Usage: python tools/classifier_stress.py [n_docs]   (default 200000)
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = 64
STOPS = ("the", "a", "of", "and", "to")


def make_corpus(n: int):
    """ids < n/2 keep-worthy (good vocab), >= n/2 reject-worthy (bad
    vocab); 10% shared vocabulary so the classes are separable but not
    trivially disjoint in feature space."""
    rng = random.Random(20260815)

    def vocab(seed):
        r = random.Random(seed)
        return [
            "".join(
                r.choice("bcdfghjklmnpqrstvwz") + r.choice("aeiou")
                for _ in range(3)
            )
            for _ in range(270)
        ]

    good, bad = vocab(1), vocab(2)
    shared = vocab(3)[:30]
    good += shared
    bad += shared

    def doc(v, i):
        toks = [
            STOPS[j % len(STOPS)] if j % 4 == 3 else rng.choice(v)
            for j in range(60)
        ]
        return " ".join(toks) + f" u{i}"

    half = n // 2
    return [
        (i, doc(good if i < half else bad, i)) for i in range(n)
    ]


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.classifier import (
        logreg_fit,
        logreg_score,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import hash_embed

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    half = N_DOCS // 2
    print(f"generating {N_DOCS} docs ...", flush=True)
    docs = spark.createDataFrame(
        make_corpus(N_DOCS), "doc_id long, text string"
    ).repartition(32)

    t0 = time.perf_counter()
    emb = hash_embed(docs, dim=DIM).localCheckpoint(eager=True)
    t_embed = time.perf_counter() - t0
    print(f"featurize {N_DOCS} docs: {t_embed:7.2f}s (hash_embed dim={DIM})",
          flush=True)

    label = (F.col("doc_id") < half).cast("double").alias("label")

    models = {}
    seed_sizes = [s for s in (2_000, 20_000) if s <= N_DOCS] or [N_DOCS // 2]
    for seed_n in seed_sizes:
        # seed = first seed_n/2 ids of each class (rest held out)
        seed = emb.where(
            (F.col("doc_id") < seed_n // 2)
            | ((F.col("doc_id") >= half) & (F.col("doc_id") < half + seed_n // 2))
        ).select("doc_id", "embedding", label)
        t0 = time.perf_counter()
        w, b = logreg_fit(seed, dim=DIM)
        dt = time.perf_counter() - t0
        models[seed_n] = (w, b)
        print(f"fit  seed={seed_n:6d}: {dt:7.2f}s "
              f"(60-round cap, one dim+2-sum aggregate per round)", flush=True)

    big_seed = seed_sizes[-1]
    w, b = models[big_seed]
    for frac, tag in ((0.1, f"{N_DOCS // 10}"), (1.0, f"{N_DOCS}")):
        part = emb if frac == 1.0 else emb.where(
            F.pmod(F.col("doc_id"), 10) == 0
        )
        t0 = time.perf_counter()
        n = logreg_score(part, w, b).where(F.col("score") >= 0.5).count()
        dt = time.perf_counter() - t0
        print(f"score corpus={tag:>7s}: {dt:7.2f}s  (kept {n})", flush=True)

    # held-out accuracy: docs outside the biggest seed
    held = emb.where(
        ~(
            (F.col("doc_id") < big_seed // 2)
            | (
                (F.col("doc_id") >= half)
                & (F.col("doc_id") < half + big_seed // 2)
            )
        )
    ).withColumn("label", label)
    n_held, wrong = (
        logreg_score(held, w, b)
        .select(
            F.count(F.lit(1)),
            F.count_if(
                ((F.col("label") == 1.0) & (F.col("score") <= 0.5))
                | ((F.col("label") == 0.0) & (F.col("score") >= 0.5))
            ),
        )
        .first()
    )
    print(f"held-out errors: {wrong}/{n_held} "
          f"({100.0 * (1 - wrong / max(n_held, 1)):.2f}% accuracy)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
