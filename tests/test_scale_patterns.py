"""Scale-pattern tests: bucketed co-located joins, the SQL entry point,
and order-independence properties of the deterministic aggregates.

These assert the 100 TB design claims that the differential oracle can't
see: shuffle elimination via bucketing, SQL-string parity with the
DataFrame plans, and partition-order invariance of det.* aggregation.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark_iceberg_dbt_airflow_spark.functions import det
from data_pipeline_spark_iceberg_dbt_airflow_spark.io import (
    read_table,
    register_views,
)


# --- bucketing: co-located join without a shuffle ---------------------------


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    """orders and customer bucketed by the join key into a tmp-located
    database -- the offline table layout that pre-pays the join shuffle."""
    loc = tmp_path_factory.mktemp("bucketed_warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{loc}'")
    for name, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        (
            read_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"bucketed.{name}")
        )
    return "bucketed"


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    """Joining two tables bucketed on the join key must not shuffle either
    side: the plan has a SortMergeJoin but ZERO Exchange nodes -- the
    bucketing pre-paid the partitioning at write time. At 100 TB this is
    the difference between re-shuffling the fact table on every join and
    never shuffling it at all."""
    # At test scale AQE would broadcast the small side (bypassing buckets
    # entirely); disable broadcast to exercise the shape a 100 TB fact-
    # fact join takes, where broadcasting is impossible.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{bucketed_db}.orders").join(
            spark.table(f"{bucketed_db}.customer"),
            spark.table(f"{bucketed_db}.orders").o_custkey
            == spark.table(f"{bucketed_db}.customer").c_custkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet shuffles (or broadcasts)
    -- proving the bucketed plan's missing Exchange is the bucketing."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    plan = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan or "Broadcast" in plan, plan


# --- SQL entry point (SURVEY §3.3: spark-sql / Thrift surface) --------------


def test_sql_string_entry_point_matches_dataframe(spark, sf_dir):
    """The reference exposes full Spark SQL through spark-sql/Thrift; the
    engine's rendering is temp views + spark.sql. A SQL-string join must
    produce exactly the DataFrame API's rows."""
    register_views(spark, sf_dir, ("orders", "customer"))
    via_sql = spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    ).collect()
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    via_df = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .count()
        .withColumnRenamed("count", "orders")
        .collect()
    )
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_df))


# --- det.* order-independence ----------------------------------------------


def test_det_sum_is_partition_order_invariant(spark, sf_dir):
    """The engine's float discipline: dsum/davg must give bit-identical
    doubles no matter how rows are partitioned or ordered -- the property
    plain float SUM lacks and the whole oracle strategy rests on."""
    ev = read_table(spark, sf_dir, "events")
    layouts = [
        ev,
        ev.repartition(37),
        ev.repartition(3, "event_type"),
        ev.orderBy("value"),
        ev.orderBy(ev.value.desc()),
    ]
    results = {
        df.agg(
            det.dsum("value").alias("s"), det.davg("value").alias("a")
        ).collect()[0]
        for df in layouts
    }
    assert len({(r.s, r.a) for r in results}) == 1


# --- property: det.* vs exact Decimal reference ------------------------------


def test_det_sum_matches_decimal_reference(spark):
    """Property check: dsum equals the exact Decimal sum (cast to double)
    for 6-decimal quantities, under hypothesis-generated values and
    arbitrary repartitioning."""
    from decimal import Decimal

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.decimals(
                min_value=Decimal("-99999.999999"),
                max_value=Decimal("99999.999999"),
                places=6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=50,
        )
    )
    def prop(vals):
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "value double"
        ).repartition(7)
        got = df.agg(det.dsum("value").alias("s")).collect()[0].s
        want = float(sum(Decimal(str(float(v))) for v in vals))
        assert got == want, (got, want, vals)

    prop()


# --- skew salting: exactness under an extreme hot key -----------------------


def test_salted_agg_exact_under_extreme_skew(spark):
    """95% of 200k rows share one key; the salted two-phase rewrite must
    return bit-identical counts/sums/mins/maxes to the direct groupBy
    (decimal partials make the re-sum order-independent), while phase 1
    spreads the hot key over 32 reducers."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.salted import (
        salted_group_agg,
    )

    df = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 101).cast("string")))
        .alias("key"),
        ((F.col("id") % 997) / 7.0).alias("v"),
        "id",
    )
    got = salted_group_agg(
        df,
        ["key"],
        salt=F.col("id"),
        buckets=32,
        count_alias="n",
        sums={"sv": F.col("v").cast("decimal(27,6)")},
        mins={"mn": F.col("v")},
        maxes={"mx": F.col("v")},
    ).select("key", "n", F.col("sv").cast("double").alias("sv"), "mn", "mx")
    want = df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("sv"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    g = {r.key: (r.n, r.sv, r.mn, r.mx) for r in got.collect()}
    w = {r.key: (r.n, r.sv, r.mn, r.mx) for r in want.collect()}
    assert g == w and g["hot"][0] == 190_000
    # the rewrite really is two grouping phases: partial+final pairs for
    # BOTH the salted and the re-aggregation stage = 4 HashAggregates.
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("HashAggregate") >= 4, plan


# --- blocked all-pairs mining under a hot cell ------------------------------


def test_blocked_cell_pairs_exact_under_hot_cell(spark):
    """The blocked all-pairs layout must emit EXACTLY the naive
    single-key cell join's pairs on a planted hot cell, while bounding
    per-task work structurally: every unordered pair meets on exactly
    one of blocks*(blocks+1)/2 block-pair keys, so the hot cell's
    quadratic space executes as bounded equi-join tasks instead of one
    straggler (AQE's skew split is a runtime heuristic and does not
    apply to broadcast-hash plans; this bound holds by construction).
    Measured at a 6000-vector hot cell: blocked 8.4s vs naive 11.5s,
    identical output (see blocked_cell_pairs docstring)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.similarity import (
        PAIR_BLOCKS,
        PAIR_THRESHOLD,
        blocked_cell_pairs,
        dot,
        norm,
    )

    rng = np.random.default_rng(11)
    n, dim = 400, 16
    rows = [(int(i), 0, rng.standard_normal(dim).astype("float32").tolist())
            for i in range(n)]  # ONE cell: label constant => maximal skew
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    emb_n = emb.select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )

    got = blocked_cell_pairs(emb_n)
    a = emb_n.select(
        F.col("vec_id").alias("id_a"), "label",
        F.col("embedding").alias("ea"), F.col("nrm").alias("na"),
    )
    b = emb_n.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("lb"),
        F.col("embedding").alias("eb"), F.col("nrm").alias("nb"),
    )
    naive = (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a", "id_b",
            (dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= PAIR_THRESHOLD)
    )
    g = {(r.id_a, r.id_b): r.cosine for r in got.collect()}
    w = {(r.id_a, r.id_b): r.cosine for r in naive.collect()}
    assert g == w and len(g) > 0  # bit-exact cosines, same pair set

    # Structural parallelism bound: the join runs on block-pair keys, and
    # every replicated row lands on one of blocks*(blocks+1)/2 keys.
    blocked = emb_n.withColumn(
        "blk", F.pmod(F.col("vec_id"), F.lit(PAIR_BLOCKS)).cast("int")
    )
    keys = (
        blocked.select(
            F.explode(
                F.expr(
                    f"transform(sequence(blk, {PAIR_BLOCKS - 1}),"
                    " j -> struct(blk AS i, j AS j))"
                )
            ).alias("bp")
        )
        .select("bp.i", "bp.j")
        .distinct()
        .count()
    )
    assert keys == PAIR_BLOCKS * (PAIR_BLOCKS + 1) // 2

    # And it must stay an equi-join: no cartesian anywhere in the plan.
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan, plan


def test_mask_repeated_spans_never_shuffles_text(spark, sf_dir):
    """The span-dedup scale contract, measured: every shuffled record is
    digest-or-interval width -- document text crosses no exchange (the
    same bound strip_boilerplate holds; spans shuffle (doc_id, pos,
    16-byte digest) and (doc_id, int, int) interval rows only)."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.metrics import (
        measure,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        mask_repeated_spans,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows, m = measure(mask_repeated_spans(docs))
    assert len(rows) == docs.count()
    assert m.shuffle_records > 0
    assert m.shuffle_bytes / m.shuffle_records < 128, m


def test_semdedup_pair_search_is_blocked_equi_join(spark):
    """SemDeDup's quadratic stage must ride the blocked in-cluster
    equi-join (never a cartesian product), and the k-means assignment +
    centroid cosine must be pure codegen (literal-inlined model, no
    model join)."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.semdedup import (
        semdedup,
    )

    emb = spark.createDataFrame(
        [
            (i, [float(i % 4 == j) + 0.01 * ((i * 7) % 5) for j in range(4)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    df = semdedup(emb, k=2, eps=0.05)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_pq_encode_is_codegen_only_and_adc_join_broadcasts(spark, sf_dir):
    """PQ's scale contract, plan-asserted: encoding adds NO Exchange
    (the codebook is inlined literals, the argmin is one expression)
    and the ADC top-k joins the broadcast query set against streaming
    codes (BroadcastHashJoin or BroadcastNestedLoopJoin for the
    key-less pq_topk variant -- never a shuffled join of the corpus),
    with the only Exchange being the top-k window's."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=8, k=8)
    enc_plan = (
        pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in enc_plan, enc_plan
    topk_plan = (
        pq_topk(emb, books, 8, 3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in topk_plan, topk_plan
    assert "SortMergeJoin" not in topk_plan, topk_plan
    assert "CartesianProduct" not in topk_plan, topk_plan
    # the window's own exchange is the only one on the scoring path
    assert topk_plan.count("Exchange") <= 2, topk_plan


def test_blocked_pairs_kernel_bit_equal_to_join_path(spark):
    """Round 9: blocked_cell_pairs(kernel=True) renders the SAME
    block-pair task decomposition as an applyInPandas kernel (one
    numpy block x block fold per task instead of one interpreted HOF
    row per candidate pair). Output must match the join path EXACTLY:
    pair set, orientation normalization, and bit-for-bit cosine
    doubles -- including the join path's documented edge semantics
    (NaN vectors weld through the threshold because Spark evaluates
    NaN >= t as TRUE; NULL-element vectors null the fold and vanish;
    width-mismatched pairs vanish; float32 inputs widen exactly)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.similarity import (
        blocked_cell_pairs,
        norm,
    )

    rng = np.random.default_rng(7)
    dim = 16
    rows = []
    vid = 0
    for label in (0, 1, 2):
        base = rng.standard_normal(dim)
        for _ in range(60):
            # near-dup cloud around the cell base: plenty of pairs on
            # both sides of the threshold
            v = base + 0.3 * rng.standard_normal(dim)
            rows.append((vid, label, v.astype("float32").tolist()))
            vid += 1
    # exact duplicates: cosine exactly 1.0 (threshold boundary >= 1.0
    # after float ops is the tie case)
    dup = rng.standard_normal(dim).astype("float32").tolist()
    rows += [(900, 0, dup), (901, 0, dup)]
    # NaN vector: welds to every pair in its cell on the join path
    nanv = [float("nan")] + [0.0] * (dim - 1)
    rows += [(910, 1, nanv)]
    # width mismatch: pairs with it vanish on both paths
    rows += [(920, 2, [1.0, 2.0])]
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    emb_n = df.select(
        "vec_id", "label", "embedding",
        norm(F.col("embedding")).alias("nrm"),
    )
    # NULL-element vector: the fold nulls, the pair vanishes (vs the
    # NaN weld above -- opposite directions, both must hold)
    nullel = spark.createDataFrame(
        [(930, 0, [None] + [1.0] * (dim - 1), 1.0)],
        "vec_id bigint, label int, embedding array<float>, nrm double",
    )
    emb_n = emb_n.unionByName(nullel)

    import struct

    def canon(out):
        # bitwise value identity, with NaN as a sentinel (any NaN bit
        # pattern reads as the same weld marker -- tuple == on floats
        # would call NaN != NaN)
        return sorted(
            (
                r["id_a"],
                r["id_b"],
                b"NAN"
                if np.isnan(r["cosine"])
                else struct.pack("d", r["cosine"]),
            )
            for r in out.collect()
        )

    join_path = canon(blocked_cell_pairs(emb_n, threshold=0.6))
    kern_path = canon(blocked_cell_pairs(emb_n, threshold=0.6, kernel=True))
    assert len(join_path) > 100  # the fixture actually exercises pairs
    assert any(c == b"NAN" for _, _, c in join_path)  # NaN weld present
    assert all(a != 930 and b != 930 for a, b, _ in join_path)
    assert join_path == kern_path  # bit-equal, ties and NaN included


def test_blocked_pairs_zero_norm_raises_and_null_label_pairs_nothing(spark):
    """Round-9 review findings: (1) a zero-norm vector with any
    partner must fail LOUDLY on both paths (ANSI DIVIDE_BY_ZERO on
    the join path; the kernel raises its parity error instead of
    numpy-0/0-NaN silently WELDING the zero vector to its whole
    cell); (2) NULL-label rows equi-join to nothing on the join path,
    so the kernel must drop them before its groupBy pools them."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.similarity import (
        blocked_cell_pairs,
        norm,
    )

    zero = spark.createDataFrame(
        [
            (1, 0, [1.0, 2.0, 3.0]),
            (2, 0, [1.0, 2.0, 3.1]),
            (3, 0, [0.0, 0.0, 0.0]),
        ],
        "vec_id bigint, label int, embedding array<double>",
    ).select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        blocked_cell_pairs(zero, threshold=0.5).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        blocked_cell_pairs(zero, threshold=0.5, kernel=True).collect()

    nulllab = spark.createDataFrame(
        [
            (1, None, [1.0, 2.0, 3.0]),
            (2, None, [1.0, 2.0, 3.0]),
            (3, 0, [1.0, 2.0, 3.0]),
            (4, 0, [1.0, 2.0, 3.0]),
        ],
        "vec_id bigint, label int, embedding array<double>",
    ).select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    jp = {(r["id_a"], r["id_b"])
          for r in blocked_cell_pairs(nulllab, threshold=0.5).collect()}
    kp = {(r["id_a"], r["id_b"])
          for r in blocked_cell_pairs(
              nulllab, threshold=0.5, kernel=True).collect()}
    assert jp == kp == {(3, 4)}


def test_blocked_pairs_zero_norm_mismatched_width_is_silent(spark):
    """Round-9 ADVICE: Spark's DivModLike short-circuits a NULL
    numerator BEFORE the divide-by-zero check, so a zero-norm vector
    whose only same-cell partners have a DIFFERENT width is silently
    dropped by the join path (zip_with pads, the fold nulls, and
    NULL / 0.0 is NULL under ANSI); the kernel used to raise on ANY
    shared-cell partner and kill the job. Both paths must return the
    same empty pair set here -- and the existing zero-norm test pins
    that a SAME-width partner still raises on both."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.similarity import (
        blocked_cell_pairs,
        norm,
    )

    mixed = spark.createDataFrame(
        [
            (1, 0, [0.0, 0.0, 0.0]),  # zero norm, width 3
            (2, 0, [1.0, 2.0]),       # its only cellmate: width 2
        ],
        "vec_id bigint, label int, embedding array<double>",
    ).select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    assert blocked_cell_pairs(mixed, threshold=0.5).collect() == []
    assert (
        blocked_cell_pairs(mixed, threshold=0.5, kernel=True).collect() == []
    )
