"""Sweep the banded-MinHash geometry's recall/wall curve (SCALING.md).

VERDICT r9 task 6: the LSH candidate gate (queries/dedup.py, NUM_PERM=8
split 4 bands x 2 rows) has P(miss) = (1 - j^r)^b = 0.32 for a pair
sitting exactly AT the 0.5-Jaccard threshold; a 16-perm / 8x2 geometry
cuts that to 0.10 for ~2x the minhash arithmetic (the minhash aggregate
is one combinable groupBy either way -- the question is whether the
extra band keys' candidate volume and the wider aggregate move the
wall). This tool measures, on the planted stress corpus at a given N,
for each geometry:

- candidate+verify wall and verified pair count,
- TRUE pairs missed vs the exact inverted-index path (the recall cost),
- canonical-doc (survivor) drift after connected components + the
  digest-group fold -- the number that actually changes the curated
  corpus.

The exact path runs once as the reference (post-digest-collapse, so it
is feasible at 1M). Geometries are swept by setting dedup.NUM_PERM /
dedup.ROWS_PER_BAND module attributes before candidate generation --
the band structs are built per call from the live constants. The
driver-oracle SQL is untouched: it renders the DEFAULT geometry, and
the sweep never runs at oracle scale.

    python tools/lsh_sweep.py <n_docs> [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# optional third arg restricts the sweep to one geometry ("16x2") --
# at 4M the full 3-geometry sweep plus the exact reference is hours
GEOMETRIES = ((8, 2), (12, 2), (16, 2))
if len(sys.argv) > 3:
    p, r = sys.argv[3].split("x")
    GEOMETRIES = ((int(p), int(r)),)


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

    sh = dedup.shingled_docs(spark, sf_dir)
    rep_map = dedup._digest_rep_map(spark, sf_dir, sh).localCheckpoint(
        eager=True
    )
    rep_sh = sh.join(
        rep_map.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=True)
    out["rep_docs"] = rep_sh.select("doc_id").distinct().count()

    def canonical_count(pairs):
        labels = connected_components(pairs.select("doc_a", "doc_b"))
        rep_lab = rep_map.join(
            labels.withColumnRenamed("doc_id", "rep"), "rep", "left"
        ).select("doc_id", F.coalesce("label", "rep").alias("label"))
        # canonical = doc labels itself; docs outside rep_map (no
        # shingles) are singletons, all canonical -- constant across
        # geometries, so count only the shingle-bearing side
        return rep_lab.where(F.col("doc_id") == F.col("label")).count()

    t0 = time.time()
    exact_pairs = (
        dedup._pair_jaccard(rep_sh)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    out["exact_pairs"] = exact_pairs.count()
    out["exact_pairs_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    out["exact_canonicals"] = canonical_count(exact_pairs)
    out["exact_cc_s"] = round(time.time() - t0, 1)

    base_geom = (dedup.NUM_PERM, dedup.ROWS_PER_BAND)
    try:
        for num_perm, rows_per_band in GEOMETRIES:
            dedup.NUM_PERM = num_perm
            dedup.ROWS_PER_BAND = rows_per_band
            tag = f"{num_perm}p_{num_perm // rows_per_band}x{rows_per_band}"
            t0 = time.time()
            pairs = dedup._verify_candidates(
                rep_sh, dedup._minhash_candidates(rep_sh)
            ).select("doc_a", "doc_b").localCheckpoint(eager=True)
            n = pairs.count()
            out[f"{tag}_pairs_s"] = round(time.time() - t0, 1)
            out[f"{tag}_pairs"] = n
            out[f"{tag}_missed"] = exact_pairs.subtract(pairs).count()
            t0 = time.time()
            out[f"{tag}_canonicals"] = canonical_count(pairs)
            out[f"{tag}_cc_s"] = round(time.time() - t0, 1)
    finally:
        dedup.NUM_PERM, dedup.ROWS_PER_BAND = base_geom

    print(json.dumps(out))
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


if __name__ == "__main__":
    main()
