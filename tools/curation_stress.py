"""End-to-end curation DAG stress run: 50k dup-heavy synthetic docs.

Generates a deterministic corpus engineered to exercise every dedup
rung at once -- exact copies (canonical clusters), a corpus-hot ~30
token passage repeated across ~10% of docs (span dedup), one-word-off
near-copies (shingle near-dup AND semantic dup), two languages (the
per-lang LM gate) -- then drives ``build_llm_curation_pipeline`` stage
by stage, materializing each output (the dbt table boundary) and
printing per-stage wall-clock + row count. The numbers land in
SCALING.md ("Measured: end-to-end curation at 50k docs").

Usage: python tools/curation_stress.py [n_docs]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
SEM_K = max(8, N_DOCS // 250)


STOPS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def make_corpus(n: int):
    # Text must CLEAR the curation quality gate (llm_pipeline.MIN_QUALITY
    # = 0.35 over stop_ratio*0.3 + alpha_ratio*0.4 + length_credit*0.3),
    # or the dedup rungs under stress would only ever see the survivors:
    # all-alpha pseudo-words with every 4th token a stopword scores
    # ~0.55 at 60 tokens. Digit-bearing vocab (w001...) scores ~0.30
    # and gated 90% of the corpus out in the first dry run.
    rng = random.Random(20260814)
    vocab = [
        "".join(rng.choice("bcdfghjklmnpqrstvwz") + rng.choice("aeiou") for _ in range(3))
        for _ in range(300)
    ]

    def words(k):
        return [
            STOPS[j % len(STOPS)] if j % 4 == 3 else rng.choice(vocab)
            for j in range(k)
        ]

    hot = " ".join(words(30))
    rows = []
    last_plain: list | None = None
    for i in range(n):
        if i % 10 == 1 and rows:
            # near-copy of the previous doc with one token changed:
            # shingle near-dup + semantic dup
            toks = rows[-1][1].split()
            toks[len(toks) // 2] = rng.choice(vocab)
            text = " ".join(toks)
        elif i % 50 == 7 and len(rows) > 5:
            text = rows[-5][1]  # exact duplicate
        elif i % 20 == 5 and last_plain:
            # SEMANTIC-ONLY dup: bag-equal chunk permutation of the last
            # plain body. Permuting 4-token chunks (aligned to the
            # stopword period, so the [v v v stop] cadence -- and the
            # bigram-LM score -- survives) kills ~half the ordered
            # 3-gram shingles: Jaccard vs the base ~0.35 < 0.5, so the
            # lexical near-dup rung CANNOT see the pair, while the
            # order-insensitive hash_embed vector is IDENTICAL (cosine
            # 1.0 > 1 - eps) -- only sem_deduped can drop it. This is
            # the rung's earn-its-cost plant (VERDICT r7 task 6: the
            # old generator's dups were all lexically visible upstream,
            # so the semantic stage measurably dropped zero rows).
            chunks = [
                last_plain[j : j + 4] for j in range(0, len(last_plain), 4)
            ]
            rng.shuffle(chunks)
            text = " ".join(t for c in chunks for t in c)
        else:
            body = words(60)
            if i % 10 == 3:
                body[20:20] = hot.split()  # the corpus-hot passage
            else:
                last_plain = body
            text = " ".join(body)
        lang = "en" if i % 5 else "de"
        rows.append((i, text, lang, "synth", len(text)))
    return rows


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        build_llm_curation_pipeline,
    )

    with tempfile.TemporaryDirectory() as sf_dir:
        t0 = time.time()
        # io.read_table probes the footer with pyarrow, so the table
        # must be ONE file named documents.parquet (as the driver
        # testdata ships): write a single part and rename it.
        stage = os.path.join(sf_dir, "_stage")
        spark.createDataFrame(
            make_corpus(N_DOCS),
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(stage)
        part = next(
            n for n in os.listdir(stage) if n.endswith(".parquet")
        )
        os.rename(
            os.path.join(stage, part),
            os.path.join(sf_dir, "documents.parquet"),
        )
        print(f"# corpus: {N_DOCS} docs written in {time.time() - t0:.1f}s")
        runner = build_llm_curation_pipeline(spark, sf_dir, sem_k=SEM_K)
        results = {}
        total = 0.0
        for name in runner._toposort(list(runner._models), satisfied=set()):
            m = runner._models[name]
            t0 = time.time()
            out = m.fn(*[results[r] for r in m.refs]).localCheckpoint(
                eager=True
            )
            dt = time.time() - t0
            results[name] = out
            total += dt
            print(f"{name:16s} {dt:7.2f}s  rows={out.count()}")
        print(f"{'TOTAL':16s} {total:7.2f}s  (sem_k={SEM_K})")
    spark.stop()


if __name__ == "__main__":
    main()
