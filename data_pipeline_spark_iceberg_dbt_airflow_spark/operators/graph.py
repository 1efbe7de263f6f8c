"""Distributed connected components (iterative min-label propagation).

Spark has no native graph operator; this is the DataFrame-only rendering
of connected components used by the dedup family and reusable for any
undirected pair graph (n-gram near-dup pairs, embedding-cosine near-dup
pairs, co-citation edges, ...). The reference has no graph surface; this
is part of the training-data extension set (duplicate CLUSTERS, not just
pairs: A~B and B~C must collapse to one survivor even when A~C was never
scored).

Algorithm and scale shape (unchanged from its round-3 in-query form,
extracted in round 4 for reuse):

- Per round, every node takes the minimum of its own label and its
  neighbors' labels: one equi-join edges x labels + one map-side-
  combinable ``min`` groupBy. Rounds ~ component diameter; near-dup
  cliques are shallow (2-4 rounds in practice).
- The iteration set holds ONLY edge-incident nodes. Singletons -- the
  overwhelming mass of a 100 TB corpus -- never enter the loop; callers
  label them with one final left join (see
  ``queries/dedup.dedup_cluster_components``).
- ``localCheckpoint`` truncates lineage each round so the plan stays
  O(1) deep regardless of round count. On a multi-executor cluster use
  reliable ``checkpoint`` (object-store dir) instead -- localCheckpoint
  blocks lose their recomputation path if an executor dies.
- Convergence is detected by the label SUM: labels only ever decrease,
  so the fixpoint is reached exactly when the sum stops changing. The
  per-round ``collect()`` moves ONE scalar to the driver -- the
  legitimate kind. Non-convergence within ``max_iterations`` raises
  instead of silently emitting partially-propagated labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Iteration backstop: far above any realistic near-dup component
#: diameter; hitting it raises (never silently truncates).
MAX_CC_ITERATIONS = 20


def connected_components(
    pairs: DataFrame, max_iterations: int = MAX_CC_ITERATIONS
) -> DataFrame:
    """Label every edge-incident node with its component's minimum id.

    ``pairs`` is an undirected edge list with two numeric id columns
    (first = one endpoint, second = the other; each unordered pair once
    is enough -- symmetrization happens here). Returns ``(doc_id,
    label)`` for every node that appears in an edge; isolated nodes are
    the caller's final left join.
    """
    a, b = pairs.columns[0], pairs.columns[1]
    canon = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iterations):
        neigh = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("neigh_min"))
        )
        labels = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("neigh_min", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        label_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if label_sum == prev_sum:
            return labels
        prev_sum = label_sum
    raise RuntimeError(
        f"label propagation did not converge in {max_iterations} "
        "rounds; component diameter exceeds the backstop"
    )
