"""Learned quality gate: distributed logistic regression
(operators/classifier.py) + the CCNet-style corpus gate
(quality/learned.py) + the curation-DAG variant that swaps it in for
the heuristic score.

The fixtures PLANT a separable world -- two disjoint vocabularies, so
hash_embed directions separate the classes -- and assert the recipe's
contract: the fit recovers the plant from a small labeled seed and
GENERALIZES to unlabeled docs, bit-identically under repartitioning,
and refuses seed sets that cannot train a binary gate.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.classifier import (
    SeedSetError,
    logreg_fit,
    logreg_score,
)

DIM = 8


def _axis(i: int, flip: float = 0.0) -> list:
    v = [0.0] * DIM
    v[i] = 1.0
    v[(i + 1) % DIM] = flip
    return v


@pytest.fixture(scope="module")
def planted(spark):
    """Positives hug axis 0, negatives axis 4 (orthogonal), with small
    wobbles; ids 100+ are held-out (unlabeled) members of each class."""
    rows = []
    for j in range(20):
        rows.append((j, _axis(0, 0.02 * (j % 5)), 1.0))
        rows.append((50 + j, _axis(4, 0.02 * (j % 5)), 0.0))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label double"
    )


def test_logreg_recovers_separable_plant(spark, planted):
    w, b = logreg_fit(planted)
    holdout = spark.createDataFrame(
        [(100, _axis(0, 0.05)), (101, _axis(4, 0.05))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["score"]
        for r in logreg_score(holdout, w, b).collect()
    }
    assert got[100] > 0.5 > got[101]
    # and the training set itself is fully separated
    scored = logreg_score(planted, w, b)
    wrong = scored.where(
        ((F.col("label") == 1.0) & (F.col("score") <= 0.5))
        | ((F.col("label") == 0.0) & (F.col("score") >= 0.5))
    ).count()
    assert wrong == 0


def test_logreg_is_deterministic_under_repartition(planted):
    wa, ba = logreg_fit(planted.repartition(7))
    wb, bb = logreg_fit(planted.repartition(3))
    assert wa == wb and ba == bb  # bit-identical: exact decimal sums


def test_logreg_rejects_untrainable_seeds(spark, planted):
    with pytest.raises(SeedSetError):
        logreg_fit(planted.where(F.col("label") == 1.0))  # single class
    with pytest.raises(SeedSetError):
        logreg_fit(planted.where(F.lit(False)))  # empty


def test_logreg_invalid_rows_excluded_and_score_null(spark):
    base = [(j, _axis(0), 1.0) for j in range(6)] + [
        (10 + j, _axis(4), 0.0) for j in range(6)
    ]
    dirty = base + [
        (90, None, 1.0),  # NULL vector
        (91, [1.0, 2.0], 0.0),  # wrong width
        (92, [float("nan")] * DIM, 1.0),  # NaN
        (93, _axis(0), None),  # NULL label
    ]
    df = spark.createDataFrame(
        dirty, "vec_id long, embedding array<double>, label double"
    )
    clean = spark.createDataFrame(
        base, "vec_id long, embedding array<double>, label double"
    )
    assert logreg_fit(df) == logreg_fit(clean)  # invalid rows inert
    w, b = logreg_fit(clean)
    got = {
        r["vec_id"]: r["score"] for r in logreg_score(df, w, b).collect()
    }
    assert got[90] is None and got[91] is None and got[92] is None
    assert got[93] is not None  # label NULL, vector fine: scorable


# --- text-level gate --------------------------------------------------------

GOOD_VOCAB = ["alpha", "bravo", "delta", "omega", "sigma", "kappa"]
BAD_VOCAB = ["zzzz", "qqqq", "xxxx", "wwww", "jjjj", "vvvv"]


def _doc(rng, vocab, n=30):
    return " ".join(rng.choice(vocab) for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    """200 docs, ids < 100 good-vocab, ids >= 100 bad-vocab; every doc
    distinct (no lexical duplicates to confound the dedup stages)."""
    rng = random.Random(8)
    rows = [
        (i, _doc(rng, GOOD_VOCAB) + f" u{i}", "en", "synth")
        for i in range(100)
    ] + [
        (100 + i, _doc(rng, BAD_VOCAB) + f" u{100 + i}", "en", "synth")
        for i in range(100)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_learned_gate_generalizes_from_seed(corpus, spark):
    from data_pipeline_spark_iceberg_dbt_airflow_spark.quality.learned import (
        learned_quality_scores,
    )

    # label 15 of each class; the other 170 docs are held out
    seed = spark.createDataFrame(
        [(i, 1) for i in range(15)] + [(100 + i, 0) for i in range(15)],
        "doc_id long, label int",
    )
    scores = learned_quality_scores(
        corpus.select("doc_id", "text"), seed
    ).collect()
    assert len(scores) == 200
    wrong = [
        r["doc_id"]
        for r in scores
        if (r["doc_id"] < 100) != (r["score"] > 0.5)
    ]
    assert not wrong, wrong  # plant fully recovered, held-out included


def test_curation_dag_with_learned_gate(spark, tmp_path):
    """The DAG variant: quality_seed swaps the heuristic gate for the
    classifier. The planted bad-vocab docs would PASS the heuristic
    (all-alpha tokens score fine) -- only the learned gate can drop
    them, and it must drop the UNLABELED ones too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        run_llm_curation,
    )

    rng = random.Random(88)
    stops = ("the", "a", "of", "and", "to")

    def doc(vocab, i):
        toks = [
            stops[j % len(stops)] if j % 4 == 3 else rng.choice(vocab)
            for j in range(40)
        ]
        return " ".join(toks) + f" u{i}"

    n = 120  # ids < n good, >= n bad
    ids = list(range(2 * n))
    texts = [doc(GOOD_VOCAB, i) for i in range(n)] + [
        doc(BAD_VOCAB, n + i) for i in range(n)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * (2 * n)),
                "source": pa.array(["synth"] * (2 * n)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    seed = spark.createDataFrame(
        [(i, 1) for i in range(20)] + [(n + i, 0) for i in range(20)],
        "doc_id long, label int",
    )
    out = run_llm_curation(
        spark, str(tmp_path), materialize=True, quality_seed=seed
    )
    curated_ids = {r["doc_id"] for r in out["curated"].select("doc_id").collect()}
    bad_kept = [i for i in curated_ids if i >= n]
    assert not bad_kept, bad_kept  # every bad doc gone, unlabeled included
    # the gate keeps the good class (LM/dedup may trim a few, never most)
    assert len(curated_ids) > n * 0.8
    # heuristic profile still materializes as the profiling surface
    assert out["doc_quality"].count() == 2 * n
    # and the heuristic alone would NOT have dropped the bad docs: the
    # learned gate is doing real work here, not shadowing MIN_QUALITY
    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        MIN_QUALITY,
    )

    heuristic_pass = {
        r["doc_id"]
        for r in out["doc_quality"]
        .where(F.col("quality_score") >= MIN_QUALITY)
        .select("doc_id")
        .collect()
    }
    assert any(i >= n for i in heuristic_pass)


def test_cli_gate_scores_documents(spark, tmp_path, capsys):
    """The gate subcommand trains on a labels file and prints ranked
    scores: planted good-vocab docs must outrank bad-vocab ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_spark_iceberg_dbt_airflow_spark.__main__ import main

    rng = random.Random(99)
    texts = [_doc(rng, GOOD_VOCAB) + f" u{i}" for i in range(40)] + [
        _doc(rng, BAD_VOCAB) + f" u{40 + i}" for i in range(40)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(80), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    list(range(10)) + list(range(40, 50)), pa.int64()
                ),
                "label": pa.array([1] * 10 + [0] * 10, pa.int64()),
            }
        ),
        str(tmp_path / "labels.parquet"),
    )
    rc = main(
        [
            "gate",
            "--sf",
            str(tmp_path),
            "--labels",
            str(tmp_path / "labels.parquet"),
            "--limit",
            "40",
        ],
        spark=spark,
    )
    captured = capsys.readouterr()
    assert rc == 0
    top = [int(line.split("\t")[0]) for line in captured.out.splitlines()]
    assert len(top) == 40
    assert all(i < 40 for i in top)  # every good doc outranks every bad
    assert "40/80 docs at or above threshold 0.5" in captured.err
