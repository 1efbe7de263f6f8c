"""Z-order layout writer (operators/layout.py).

The pruning claim is measured with the same statistics a real scan
uses: per-row-group min/max from the parquet footers. A rectangle
predicate over two z-ordered dimensions must be skippable in far more
row groups than under a one-column linear sort; content must be
identical either way.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
    write_zordered,
    zorder_key,
)

N_FILES = 16
#: rectangle predicate: wide on the first dimension (half its range)
#: and narrow on the second (1/16) -- the regime where a dim-1 linear
#: sort stops helping and only multi-dimensional locality prunes.
CUST_FRAC, PRICE_FRAC = 2, 16


def _surviving_row_groups(dirpath: str, preds: dict[str, tuple[float, float]]):
    """(survivors, total): row groups whose min/max intersect every
    predicate interval -- exactly the footer-stats pruning decision."""
    total = survivors = 0
    for f in sorted(glob.glob(os.path.join(dirpath, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            keep = True
            for col, (lo, hi) in preds.items():
                st = meta.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats => cannot skip
                if float(st.max) < lo or float(st.min) > hi:
                    keep = False
                    break
            survivors += keep
    return survivors, total


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = tmp_path_factory.mktemp("layout")
    zdir, ldir = str(base / "zorder"), str(base / "linear")
    write_zordered(orders, zdir, ["o_custkey", "o_totalprice"], N_FILES)
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )
    lohi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    return orders, zdir, ldir, lohi


def _rect(lohi):
    c_lo, c_hi, p_lo, p_hi = float(lohi[0]), float(lohi[1]), float(lohi[2]), float(lohi[3])
    c_w = (c_hi - c_lo) / CUST_FRAC
    p_w = (p_hi - p_lo) / PRICE_FRAC
    mid_c = c_lo + (c_hi - c_lo) / 2
    mid_p = p_lo + (p_hi - p_lo) / 2
    return {
        "o_custkey": (mid_c, mid_c + c_w),
        "o_totalprice": (mid_p, mid_p + p_w),
    }


def test_zorder_prunes_more_row_groups(layouts):
    """Rectangle predicate: the z layout must leave at most half the
    surviving row groups of the custkey-sorted layout (which cannot
    prune on o_totalprice at all)."""
    _, zdir, ldir, lohi = layouts
    preds = _rect(lohi)
    z_live, z_total = _surviving_row_groups(zdir, preds)
    l_live, l_total = _surviving_row_groups(ldir, preds)
    assert z_total > 4 and l_total > 4
    assert z_live * 2 <= l_live, (z_live, z_total, l_live, l_total)


def test_zorder_prunes_on_secondary_dim_alone(layouts):
    """A predicate ONLY on the second dimension: linear-by-custkey keeps
    every row group; z-order must skip some."""
    _, zdir, ldir, lohi = layouts
    preds = {"o_totalprice": _rect(lohi)["o_totalprice"]}
    z_live, z_total = _surviving_row_groups(zdir, preds)
    l_live, l_total = _surviving_row_groups(ldir, preds)
    assert l_live == l_total  # linear layout: no pruning on dim 2
    assert z_live < z_total


def test_layout_preserves_content(spark, layouts):
    orders, zdir, _, _ = layouts
    back = spark.read.parquet(zdir)
    assert back.count() == orders.count()
    assert (
        back.agg(F.sum("o_orderkey")).collect()[0][0]
        == orders.agg(F.sum("o_orderkey")).collect()[0][0]
    )


def test_zorder_key_is_codegen_only(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    cells = [
        (F.col("o_custkey") % 256).cast("long"),
        (F.col("o_orderkey") % 256).cast("long"),
    ]
    plan = (
        orders.select(zorder_key(cells, bits=8).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_write_zordered_four_dims_auto_shrinks(spark, tmp_path):
    """The documented 4-dim configuration at the 16-bit default must
    WORK: write_zordered auto-shrinks bits to 63 // ndims (15 here) so
    the z-value stays inside a signed long's value bits, while
    zorder_key itself still rejects an explicit overflow."""
    df = spark.createDataFrame(
        [(i, i * 3 % 97, i * 7 % 89, i * 11 % 83) for i in range(200)],
        "a long, b long, c long, d long",
    )
    out = str(tmp_path / "z4")
    write_zordered(df, out, ["a", "b", "c", "d"], num_files=4)
    assert spark.read.parquet(out).count() == 200
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b"), F.col("c"), F.col("d")], bits=16)


def test_zorder_key_interleaves(spark):
    """Hand-check the Morton interleave on known cells: (x=0b11, y=0b01)
    with 2 bits -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3 = 1 + 2 + 4 = 7."""
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    z = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()[0]["z"]
    assert z == 7


def test_zorder_key_bijective_on_full_grid(spark):
    """Exhaustive over all 64x64 cell pairs: the interleave is a
    bijection onto [0, 4096) and a Python de-interleave inverts every
    Spark-computed value -- the Morton math is exactly right, not just
    collision-free."""
    grid = (
        spark.range(64)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(64).select(F.col("id").alias("y")))
    )
    rows = grid.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    zs = {r["z"] for r in rows}
    assert zs == set(range(4096))
    for r in rows:
        x = y = 0
        for i in range(6):
            x |= ((r["z"] >> (2 * i)) & 1) << i
            y |= ((r["z"] >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r["x"], r["y"]), r


def test_compact_parquet_reduces_files_preserves_content(
    spark, sf_dir, tmp_path
):
    import glob

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        compact_parquet,
    )

    src, dest = str(tmp_path / "many"), str(tmp_path / "few")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    orders.repartition(64).write.parquet(src)  # the accreted-small-files state
    assert len(glob.glob(src + "/*.parquet")) == 64

    before, after = compact_parquet(spark, src, dest, 4, sort_col="o_orderkey")
    assert len(glob.glob(dest + "/*.parquet")) == 4
    back = spark.read.parquet(dest)
    assert back.count() == orders.count()
    assert (
        back.agg(F.sum("o_orderkey")).collect()[0][0]
        == orders.agg(F.sum("o_orderkey")).collect()[0][0]
    )
    # sort order established: each output file's o_orderkey range is tight
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(dest + "/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        st = meta.row_group(0).column(0).statistics
        ranges.append((st.min, st.max))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # non-overlapping => stats prune across files


def test_bucketed_join_is_exchange_and_sort_free(spark, sf_dir, tmp_path):
    """The co-location contract, plan-asserted: joining two tables
    bucketed+sorted on the same key with the same bucket count carries
    ZERO Exchange and ZERO Sort below the SortMergeJoin, while the
    identical unbucketed join shuffles (and sorts) both sides. Values
    must match the plain join exactly -- layout changes physics, never
    results."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        bucketed_sorted_reader,
        write_bucketed,
    )

    flag = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        lineitem = read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            "o_orderkey",
            8,
        )
        # Sort-elision rides the SCOPED reader helper -- the session-
        # global legacy flag must only be live while plans over this
        # writer's one-file-per-bucket tables are being built.
        assert spark.conf.get(flag, None) is None
        with bucketed_sorted_reader(spark):
            assert spark.conf.get(flag) == "true"
            bj = spark.table("b_orders").join(
                spark.table("b_lineitem"), "o_orderkey"
            )
            plan = bj._jdf.queryExecution().executedPlan().toString()
        assert spark.conf.get(flag, None) is None  # restored (was unset)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Sort" not in plan.replace("SortMergeJoin", ""), plan
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange") >= 2, plain_plan
        # identical results
        a = sorted(map(tuple, bj.collect()))
        b = sorted(map(tuple, plain.collect()))
        assert a == b and len(a) > 0
        # a prior explicit value is restored too (not blindly unset)
        spark.conf.set(flag, "false")
        with bucketed_sorted_reader(spark):
            assert spark.conf.get(flag) == "true"
        assert spark.conf.get(flag) == "false"
        # and restoration survives an exception inside the block
        with pytest.raises(RuntimeError):
            with bucketed_sorted_reader(spark):
                raise RuntimeError("boom")
        assert spark.conf.get(flag) == "false"
        spark.conf.unset(flag)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(flag)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_write_bucketed_overwrites_stale_location(spark):
    # r11: a DEAD session's managed-table directory (present on disk,
    # absent from the in-memory catalog) must not fail a fresh
    # overwrite with LOCATION_ALREADY_EXISTS -- the exact shape every
    # restarted local tool run hits (the 4M rerun crash).
    import os
    import shutil
    from urllib.parse import urlparse

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        write_bucketed,
    )

    tbl = "t_stale_loc_guard"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, tbl)
    try:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        os.makedirs(loc, exist_ok=True)  # the debris
        with open(os.path.join(loc, "part-junk.parquet"), "wb") as f:
            f.write(b"debris")
        df = spark.range(100).withColumnRenamed("id", "doc_id")
        write_bucketed(df, tbl, "doc_id", 4, sort=True)
        assert spark.table(tbl).count() == 100
        # and a normal overwrite of the LIVE table still works
        write_bucketed(df.limit(7), tbl, "doc_id", 4, sort=True)
        assert spark.table(tbl).count() == 7
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(loc, ignore_errors=True)


def test_stale_location_guard_inmemory_only_and_crash_recoverable(
    spark, monkeypatch
):
    """r12 (ADVICE): (a) the debris cleanup is gated to the in-memory
    catalog -- under a persistent metastore an unseen location may be
    another session's LIVE table, so write_bucketed must leave it
    alone and surface Spark's own error; (b) the debris is renamed
    aside, not deleted, so a crash mid-saveAsTable leaves the prior
    files recoverable on disk."""
    import glob
    import os
    import shutil
    from urllib.parse import urlparse

    import pytest
    from pyspark.sql.readwriter import DataFrameWriter

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        write_bucketed,
    )

    tbl = "t_stale_loc_gate"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, tbl)
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    real_get = type(spark.conf).get

    def hive_get(self, key, *a):
        if key == "spark.sql.catalogImplementation":
            return "hive"
        return real_get(self, key, *a)

    try:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        os.makedirs(loc, exist_ok=True)
        with open(os.path.join(loc, "part-junk.parquet"), "wb") as f:
            f.write(b"debris")
        # (a) claimed-persistent catalog: debris untouched, loud error
        monkeypatch.setattr(type(spark.conf), "get", hive_get)
        with pytest.raises(Exception):
            write_bucketed(df, tbl, "doc_id", 4, sort=True)
        assert os.path.exists(os.path.join(loc, "part-junk.parquet"))
        monkeypatch.undo()
        # (b) in-memory catalog + write crash: debris renamed aside,
        # still on disk under <loc>.stale-*
        def boom(self, name):
            raise RuntimeError("simulated mid-write crash")

        monkeypatch.setattr(DataFrameWriter, "saveAsTable", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            write_bucketed(df, tbl, "doc_id", 4, sort=True)
        monkeypatch.undo()
        stale = glob.glob(loc + ".stale-*")
        assert stale and os.path.exists(
            os.path.join(stale[0], "part-junk.parquet")
        )
        # plant an OLDER stale sibling from a hypothetical earlier
        # crash: the r12 ADVICE accumulation case -- each call used to
        # remove only its OWN debris
        os.makedirs(loc + ".stale-deadbeef", exist_ok=True)
        # a clean retry works, then removes its own debris AND every
        # older stale sibling (r13)
        write_bucketed(df, tbl, "doc_id", 4, sort=True)
        assert spark.table(tbl).count() == 10
        assert glob.glob(loc + ".stale-*") == []
        # a normal overwrite of the LIVE table (no rename this time)
        # also sweeps any siblings a crash left behind
        os.makedirs(loc + ".stale-cafef00d", exist_ok=True)
        write_bucketed(df.limit(3), tbl, "doc_id", 4, sort=True)
        assert spark.table(tbl).count() == 3
        assert glob.glob(loc + ".stale-*") == []
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(loc, ignore_errors=True)
        for d in glob.glob(loc + ".stale-*"):
            shutil.rmtree(d, ignore_errors=True)


def test_bucket_count_for_scales_with_corpus():
    """r15 (VERDICT r14 #1): the per-run bucket count grows with the
    corpus -- floor 32 up through ~4M docs (historical layouts and
    oracle-scale renderings unchanged), power-of-two growth above it so
    differently-sized generations still coalesce in joins."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        DOCS_PER_BUCKET,
        bucket_count_for,
    )

    # unknown / tiny / oracle-scale corpora keep the floor
    assert bucket_count_for(None) == 32
    assert bucket_count_for(0) == 32
    assert bucket_count_for(5_000) == 32
    assert bucket_count_for(1_000_000) == 32
    assert bucket_count_for(4_000_000) == 32
    # growth engages past floor * DOCS_PER_BUCKET and stays pow2
    assert bucket_count_for(32 * DOCS_PER_BUCKET) == 32
    assert bucket_count_for(32 * DOCS_PER_BUCKET + 1) == 64
    assert bucket_count_for(8_000_000) == 64
    assert bucket_count_for(16_000_000) == 128
    for n in (1, 10**6, 8 * 10**6, 10**8):
        c = bucket_count_for(n)
        assert c >= 32 and (c & (c - 1)) == 0
        # enough buckets that no bucket exceeds the target size
        assert c * DOCS_PER_BUCKET >= n
    # explicit floor override respected
    assert bucket_count_for(100, floor=8) == 8
    # a non-pow2 floor is itself rounded UP to a power of two, so the
    # documented coalesceBucketsInJoin invariant holds for all inputs
    # (r16, ADVICE r15)
    assert bucket_count_for(100, floor=48) == 64
    assert bucket_count_for(None, floor=48) == 64
    assert bucket_count_for(10_000_000, floor=48) == 128
