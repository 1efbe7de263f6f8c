"""Product quantization (operators/pq.py): training determinism,
encode/decode fidelity, numpy-differential ADC scores, and recall on a
corpus with real cluster structure (the driver fixtures' embeddings
are unstructured by construction, so structure is planted here)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.pq import (
    pq_decode,
    pq_encode,
    pq_fit,
    pq_topk,
)

DIM = 16
M = 4
K = 4


def _rng_vec(rng, center):
    return [float(x) for x in center + rng.normal(0.0, 0.02, DIM)]


@pytest.fixture(scope="module")
def clustered(spark):
    """60 vectors in 3 well-separated Gaussian clusters (plus NULL and
    wrong-dim rows): every subspace sees 3 tight blobs, so a K=4
    codebook should quantize with small error and ADC rankings should
    recover true neighbors."""
    rng = np.random.default_rng(7)
    centers = [np.zeros(DIM) for _ in range(3)]
    for i, c in enumerate(centers):
        c[i * 5] = 1.0
        c[i * 5 + 1] = -0.5
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, _rng_vec(rng, c)))
            vid += 1
    rows.append((vid, None))
    rows.append((vid + 1, [1.0, 2.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def books(clustered):
    return pq_fit(clustered, m=M, k=K)


def test_pq_fit_shape_and_determinism(clustered, books):
    assert sorted(books) == list(range(M))
    for s in range(M):
        assert sorted(books[s]) == list(range(K))
        for c in range(K):
            assert len(books[s][c]) == DIM // M
    # identical model from a differently-partitioned input
    again = pq_fit(clustered.repartition(7), m=M, k=K)
    assert again == books


def test_pq_fit_errors(spark, clustered):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pq_fit(empty, m=M, k=K)
    with pytest.raises(ValueError, match="divisible"):
        pq_fit(clustered, m=3, k=K)
    with pytest.raises(ValueError, match="at least k"):
        pq_fit(clustered, m=M, k=1000)


def test_pq_encode_codes_and_nulls(clustered, books):
    got = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(clustered, books).collect()
    }
    n = len(got)
    assert got[n - 2] is None and got[n - 1] is None  # NULL / wrong-dim
    valid = {k: v for k, v in got.items() if v is not None}
    assert len(valid) == 60
    for codes in valid.values():
        assert len(codes) == M
        assert all(0 <= c < K for c in codes)
    # codes match an independent numpy argmin over the same codebooks
    rows = {
        r["vec_id"]: r["embedding"]
        for r in clustered.collect()
        if r["embedding"] is not None and len(r["embedding"]) == DIM
    }
    dsub = DIM // M
    for vid, emb in rows.items():
        v = np.asarray(emb)
        for s in range(M):
            sv = v[s * dsub : (s + 1) * dsub]
            dists = [
                float(((sv - np.asarray(books[s][c])) ** 2).sum())
                for c in range(K)
            ]
            assert got[vid][s] == int(np.argmin(dists))


def test_pq_quantization_error_is_small_on_clustered_data(clustered, books):
    """Reconstruction relative error << 1 on data with subspace
    structure -- the compression is lossy but must stay informative."""
    dec = pq_decode(pq_encode(clustered, books), books).collect()
    errs = []
    for r in dec:
        if r["codes"] is None:
            assert r["approx"] is None
            continue
        v = np.asarray(r["embedding"])
        a = np.asarray(r["approx"])
        errs.append(np.linalg.norm(v - a) / np.linalg.norm(v))
    assert errs and float(np.median(errs)) < 0.15


def test_pq_adc_cosine_matches_numpy(clustered, books):
    """Every ADC score equals the numpy cosine between the full query
    and the RECONSTRUCTED candidate (that is ADC's definition)."""
    out = pq_topk(clustered, books, query_n=3, top_k=5).collect()
    assert out
    emb = {
        r["vec_id"]: None if r["embedding"] is None else np.asarray(r["embedding"])
        for r in clustered.collect()
    }
    dsub = DIM // M
    codes = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(clustered, books).collect()
        if r["codes"] is not None
    }
    for r in out:
        q = emb[r["id_a"]]
        recon = np.concatenate(
            [np.asarray(books[s][codes[r["id_b"]][s]]) for s in range(M)]
        )
        want = float(
            q @ recon / (np.linalg.norm(q) * np.linalg.norm(recon))
        )
        assert math.isclose(r["cosine"], want, rel_tol=0, abs_tol=1e-9)


def test_pq_topk_retrieves_the_right_cluster(clustered, books):
    """PQ's value proposition at this geometry: ADC must rank SAME-
    CLUSTER vectors above other-cluster ones. (Exact top-5 parity is
    deliberately NOT asserted: all 20 members of a tight blob quantize
    to near-identical codes, so intra-cluster ordering is below the
    quantizer's resolution -- that is lossy compression working as
    specified, and the rerank stage of a real deployment
    (_quantized_rerank_scored's stage 2) exists precisely to restore
    it.)"""
    out = pq_topk(clustered, books, query_n=3, top_k=19).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["id_a"], []).append(r)
    assert sorted(by_q) == [0, 1, 2]  # queries are cluster-0 members
    for qid, rows in by_q.items():
        assert len(rows) == 19
        same = sum(1 for r in rows if r["id_b"] < 20)  # cluster 0 ids
        assert same == 19, (qid, sorted(r["id_b"] for r in rows))


def test_ivfpq_equals_pq_restricted_to_cells(spark, clustered, books):
    """IVF-PQ = PQ scoring restricted to the query's coarse cell: with
    3 well-separated cells the in-cell top-k must (a) only ever pair
    same-cell ids and (b) agree exactly with the whole-corpus ADC
    ranking filtered to the cell -- the cell gate prunes candidates,
    never reorders them."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.pq import (
        ivfpq_topk,
    )

    cents = kmeans_fit(clustered, k=3)
    cells = {
        r["vec_id"]: r["cell"]
        for r in assign_clusters(
            clustered, cents, out_col="cell"
        ).collect()
        if r["cell"] is not None
    }
    got = ivfpq_topk(clustered, cents, books, query_n=3, top_k=10).collect()
    assert got
    for r in got:
        assert cells[r["id_a"]] == cells[r["id_b"]]
    # whole-corpus ADC, filtered per query to its cell, reranked
    full = pq_topk(clustered, books, query_n=3, top_k=10**6).collect()
    want = {}
    for r in sorted(full, key=lambda r: (r["id_a"], r["rank"])):
        if cells[r["id_a"]] == cells.get(r["id_b"]):
            want.setdefault(r["id_a"], []).append(r["id_b"])
    got_by_q = {}
    for r in sorted(got, key=lambda r: (r["id_a"], r["rank"])):
        got_by_q.setdefault(r["id_a"], []).append(r["id_b"])
    assert got_by_q == {q: ids[:10] for q, ids in want.items()}


def test_pq_excludes_nan_vectors_everywhere(spark, clustered, books):
    """A NaN-carrying vector must be invisible: NULL codes, absent from
    training, and -- as a query -- no ranked output (not NaN-cosine
    rows ranked by id tiebreak)."""
    import math as _m

    withnan = clustered.union(
        spark.createDataFrame(
            [(100, [float("nan")] * DIM)],
            "vec_id long, embedding array<double>",
        )
    )
    codes = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(withnan, books).collect()
    }
    assert codes[100] is None
    # training ignores the NaN row entirely: same model either way
    assert pq_fit(withnan, m=M, k=K) == books
    # a NaN query (id 100 >= query_n here, so plant one at id 0's slot)
    nan_q = spark.createDataFrame(
        [(0, [float("nan")] * DIM)] + [
            (r["vec_id"], r["embedding"])
            for r in clustered.collect()
            if r["vec_id"] != 0
        ],
        "vec_id long, embedding array<double>",
    )
    out = pq_topk(nan_q, books, query_n=1, top_k=5).collect()
    assert out == []
    # zero-norm queries likewise produce no NULL-cosine ranks
    zero_q = spark.createDataFrame(
        [(0, [0.0] * DIM)], "vec_id long, embedding array<double>"
    ).union(clustered.where("vec_id > 0"))
    out = pq_topk(zero_q, books, query_n=1, top_k=5).collect()
    assert out == []
    for r in pq_topk(clustered, books, query_n=3, top_k=5).collect():
        assert r["cosine"] is not None and not _m.isnan(r["cosine"])
