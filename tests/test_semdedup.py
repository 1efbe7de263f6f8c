"""SemDeDup: semantic dedup over embeddings (queries/semdedup.py).

The driver fixtures' embeddings are deliberately unstructured (no
semantic near-dups by construction), so these tests PLANT structure:
well-separated direction clusters with near-duplicate groups
(perturbation << eps) and singletons, then assert the paper's contract
-- every planted group collapses to exactly one survivor, the survivor
is the member FARTHEST from its centroid (lowest cosine), singletons
and NULL/wrong-dim vectors all survive, and the whole labeling is a
deterministic function of the input set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.semdedup import semdedup

DIM = 8


def _vec(direction: int, wobble: float = 0.0, scale: float = 1.0) -> list:
    """A vector along axis ``direction`` with a small off-axis wobble --
    wobble 0.01 keeps cosine-to-base ~0.99995 (within eps=0.03); a
    different axis is orthogonal (cosine 0, far outside eps)."""
    v = [0.0] * DIM
    v[direction] = scale
    v[(direction + 1) % DIM] = wobble * scale
    return v


@pytest.fixture(scope="module")
def planted(spark):
    """3 orthogonal clusters; axis-0 carries a 3-way near-dup group and
    one singleton, axis-1 a 2-way group, axis-2 singletons only; plus a
    NULL and a wrong-dimension row."""
    rows = [
        # 3-way semantic dup group (ids 0,1,2), wobble grows with id so
        # id 2 is farthest from the group/centroid direction
        (0, _vec(0, 0.000)),
        (1, _vec(0, 0.005, scale=2.0)),  # different magnitude, same meaning
        (2, _vec(0, 0.010)),
        (3, _vec(0, 0.400)),  # same cluster, NOT a dup (cos ~0.93)
        # 2-way group (ids 10, 11)
        (10, _vec(1, 0.000)),
        (11, _vec(1, 0.008)),
        # singletons
        (20, _vec(2, 0.0)),
        (21, _vec(2, 0.5)),
        (30, None),  # NULL embedding
        (31, [1.0, 2.0]),  # wrong dimension
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def result(planted):
    out = semdedup(planted, k=3, eps=0.03).collect()
    return {r["vec_id"]: r for r in out}


def test_semdedup_groups_collapse_to_one_survivor(result):
    g1 = [result[i] for i in (0, 1, 2)]
    comps = {r["component"] for r in g1}
    assert len(comps) == 1 and None not in comps, g1
    assert sum(r["keep"] for r in g1) == 1
    g2 = [result[i] for i in (10, 11)]
    assert result[10]["component"] == result[11]["component"] is not None
    assert sum(r["keep"] for r in g2) == 1
    # the two groups are distinct components
    assert g1[0]["component"] != g2[0]["component"]


def test_semdedup_survivor_is_farthest_from_centroid(planted, result):
    """The paper keeps the LOWEST-centroid-cosine member: in each
    component the survivor's cos_centroid is the minimum (ties to the
    smallest id), and cos_centroid itself matches an INDEPENDENT numpy
    recomputation from the same deterministic k-means fit."""
    import numpy as np

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        kmeans_fit,
    )

    for comp in {r["component"] for r in result.values()} - {None}:
        members = [r for r in result.values() if r["component"] == comp]
        survivor = [r for r in members if r["keep"]]
        assert len(survivor) == 1
        best = min((r["cos_centroid"], r["vec_id"]) for r in members)
        assert (survivor[0]["cos_centroid"], survivor[0]["vec_id"]) == best

    cents = {
        cid: np.array(c)
        for cid, c in kmeans_fit(planted, 3, vec_col="embedding").items()
    }
    for row in planted.collect():
        got = result[row["vec_id"]]
        if row["embedding"] is None or len(row["embedding"]) != DIM:
            continue
        v = np.array(row["embedding"])
        c = cents[got["cluster"]]
        want = float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
        assert abs(got["cos_centroid"] - want) < 1e-9, (row["vec_id"], want)


def test_semdedup_non_duplicates_all_kept(result):
    for vid in (3, 20, 21):
        assert result[vid]["component"] is None, result[vid]
        assert result[vid]["keep"] is True


def test_semdedup_null_and_wrong_dim_pass_through(result):
    for vid in (30, 31):
        assert result[vid]["cluster"] is None
        assert result[vid]["cos_centroid"] is None
        assert result[vid]["component"] is None
        assert result[vid]["keep"] is True


def test_semdedup_is_deterministic(planted):
    a = sorted(map(tuple, semdedup(planted, k=3, eps=0.03).collect()))
    b = sorted(
        map(
            tuple,
            semdedup(
                planted.repartition(7), k=3, eps=0.03
            ).collect(),
        )
    )
    assert a == b


def test_semdedup_row_count_preserved(planted, result):
    assert len(result) == planted.count()


def test_semdedup_on_fixture_corpus(spark, sf_dir):
    """The driver fixture is unstructured (no semantic near-dups at
    eps=0.03), so semdedup must be the identity there: every vector
    kept, no components -- the false-merge guard."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = semdedup(emb, k=4, eps=0.03)
    assert out.where(~F.col("keep")).count() == 0
    assert out.count() == emb.count()


def test_semdedup_over_hash_embeddings_model_free(spark):
    """The model-free bridge: a corpus WITHOUT a neural embedding column
    runs semantic dedup over hash_embed vectors -- planted lexical
    near-dups (one word changed in 12) collapse; unrelated docs all
    survive."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        hash_embed,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    variant = base.replace("mu", "nu")  # 11/12 tokens shared
    others = [
        " ".join(f"x{i}_{j}" for j in range(12)) for i in range(6)
    ]
    rows = [(0, base), (1, variant)] + [
        (i + 2, t) for i, t in enumerate(others)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hash_embed(docs).select(
        F.col("doc_id").alias("vec_id"), F.col("embedding")
    )
    out = {
        r["vec_id"]: r
        for r in semdedup(emb, k=2, eps=0.2).collect()
    }
    assert out[0]["component"] is not None
    assert out[0]["component"] == out[1]["component"]
    assert out[0]["keep"] != out[1]["keep"]  # exactly one survives
    for i in range(2, 8):
        assert out[i]["keep"] is True and out[i]["component"] is None


def test_semdedup_custom_vec_col(planted):
    """The advertised vec_col parameter must work end to end (the
    internal rename to 'embedding' cannot leak into predicates)."""
    renamed = planted.withColumnRenamed("embedding", "vec")
    out = {
        r["vec_id"]: r
        for r in semdedup(renamed, k=3, eps=0.03, vec_col="vec").collect()
    }
    assert sum(r["keep"] for r in (out[0], out[1], out[2])) == 1
    assert out[30]["keep"] is True


def test_semdedup_nan_embeddings_pass_through(spark):
    """NaN-containing vectors are the third invalid class: they must not
    crash the k-means fit, must not weld their cluster together (Spark
    evaluates NaN >= t as TRUE), and pass through kept/unlabeled."""
    rows = [
        (0, _vec(0, 0.0)),
        (1, _vec(0, 0.005)),  # genuine dup pair with 0
        (2, _vec(1, 0.0)),
        (3, _vec(1, 0.4)),  # same cluster as 2, NOT a dup
        (9, [float("nan")] + [1.0] * (DIM - 1)),
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup(docs, k=2, eps=0.03).collect()}
    assert out[9]["cluster"] is None
    assert out[9]["component"] is None
    assert out[9]["keep"] is True
    # the real dup pair still collapses; the non-dups stay apart
    assert out[0]["component"] == out[1]["component"] is not None
    assert out[2]["component"] is None and out[3]["component"] is None


def test_semdedup_null_element_embeddings_pass_through(spark):
    """NULL elements inside a correct-width vector are the fourth
    invalid class (round-8 ADVICE): F.isnan(NULL) is NULL (falsy), so
    an isnan-only gate let [null, ...] into the fit, where the Arrow
    kernel saw NaN while the Catalyst expression saw NULL. They must be
    excluded from fit and comparison like NaN, passing through
    kept/unlabeled -- under BOTH assignment paths, so this pins the
    exists(isNull | isnan) gate, not kernel behavior."""
    rows = [
        (0, _vec(0, 0.0)),
        (1, _vec(0, 0.005)),  # genuine dup pair with 0
        (2, _vec(1, 0.0)),
        (9, [None] + [1.0] * (DIM - 1)),  # NULL element, correct width
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup(docs, k=2, eps=0.03).collect()}
    assert out[9]["cluster"] is None
    assert out[9]["component"] is None
    assert out[9]["keep"] is True
    assert out[0]["component"] == out[1]["component"] is not None
    assert out[2]["component"] is None


def test_scoring_kernel_bit_equal_to_expression_path(
    planted, monkeypatch
):
    """Round 9: above _VECTORIZED_CELLS the centroid-cosine scoring
    scan runs as an Arrow kernel (per-dim fold in the HOF's exact add
    order) instead of the interpreted dot/norm expressions. Forcing
    the threshold to 0 routes BOTH the assignment and the scoring
    through their kernels; every output column -- cos_centroid doubles
    bit-for-bit, components, survivors -- must match the pure-
    expression run exactly, NULL pass-throughs included."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators import (
        kmeans as _kmeans,
    )

    expr_rows = {
        r["vec_id"]: r for r in semdedup(planted, k=3, eps=0.03).collect()
    }
    monkeypatch.setattr(_kmeans, "_VECTORIZED_CELLS", 0)
    kern_rows = {
        r["vec_id"]: r for r in semdedup(planted, k=3, eps=0.03).collect()
    }
    assert set(expr_rows) == set(kern_rows)
    for vid, er in expr_rows.items():
        kr = kern_rows[vid]
        assert er["cluster"] == kr["cluster"], vid
        assert er["component"] == kr["component"], vid
        assert er["keep"] == kr["keep"], vid
        if er["cos_centroid"] is None:
            assert kr["cos_centroid"] is None, vid
        else:
            # bit-equality, not approx: the fold contract
            assert er["cos_centroid"] == kr["cos_centroid"], vid


def test_corpus_rows_hint_switches_kernel_and_preserves_output(planted):
    """Round-10: the pair-path switch keys on the expected candidate
    count N^2/(2k) when the caller passes a corpus-size hint -- a huge
    hint must route the blocked pair search through the Arrow kernel
    (the old k*dim gate read small-k/large-N as 'join path', the
    anti-correlation trap) with output identical to the join path."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.semdedup import (
        pair_kernel_default,
    )

    # the proxy itself: the trap case (small k, large N) picks the
    # kernel; small corpora stay on the oracle-expressible join path;
    # every round-9 k-sweep point picks the kernel
    assert pair_kernel_default(1_000_000, 8) is True
    assert pair_kernel_default(5_000, 20) is False
    assert all(
        pair_kernel_default(1_000_000, k) for k in (500, 1000, 2000, 4000)
    )

    base = {
        r["vec_id"]: r
        for r in semdedup(planted, k=3, eps=0.03, pair_kernel=False).collect()
    }
    hinted = {
        r["vec_id"]: r
        for r in semdedup(
            planted, k=3, eps=0.03, corpus_rows=10_000_000
        ).collect()
    }
    assert set(base) == set(hinted)
    for vid, er in base.items():
        kr = hinted[vid]
        assert (er["component"], er["keep"]) == (
            kr["component"],
            kr["keep"],
        ), vid
        assert er["cos_centroid"] == kr["cos_centroid"] or (
            er["cos_centroid"] is None and kr["cos_centroid"] is None
        ), vid
