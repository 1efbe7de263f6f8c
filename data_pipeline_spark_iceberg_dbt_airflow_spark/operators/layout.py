"""Z-order (Morton curve) data layout for multi-dimensional scan pruning.

Parquet scans prune row groups with min/max column statistics, so the
fraction of a 100 TB table a predicate actually reads is decided by HOW
THE ROWS WERE LAID OUT at write time. A sort on one column gives perfect
pruning on that column and none on any other; interleaving the bits of
several columns (the Morton / Z-order curve -- the same layout Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite produce) keeps rows
close in EVERY interleaved dimension, so a rectangle predicate touches
~O(fraction^(1/d)) of the row groups instead of all of them. The
reference's stack gets this from Iceberg table maintenance; here it is a
first-class writer so plain-Parquet deployments get the same physics.

Mechanics, all JVM-side:

- Each dimension is min-max normalized to a ``bits``-wide integer (the
  min/max come from one aggregate row -- a bounded, model-sized
  collect). Normalization is a codegen projection; NULLs map to cell 0
  so they cluster instead of scattering.
- The z-value interleaves the dimensions' bits with ``getbit`` +
  constant shifts -- pure whole-stage codegen, no UDF, no shuffle of
  its own.
- The write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``:
  one range shuffle prices the layout once at write time, and every
  output file (and every row group inside it) covers a tight z-range,
  i.e. a small hyper-rectangle of the key space.

Skew note: min-max cells degrade when a dimension is heavily skewed
(most rows land in few cells). For skewed dimensions, pre-map the
column through a rank/percentile transform (one extra shuffle) and
z-order the ranks; the interleave itself is distribution-agnostic.

The claimed pruning win is MEASURED, not asserted: the test reads back
per-row-group min/max parquet statistics and counts how many row groups
a rectangle predicate could skip under z-order vs a linear sort
(tests/test_layout.py). Measured on `orders` at sf0.1, 32 files
(round 4): a (half-custkey x 1/16-price) rectangle survives in 5/32
row groups z-ordered vs 17/32 custkey-sorted; a price-only predicate
survives in 8/32 vs 32/32 (a one-column sort cannot prune the other
dimension at all).
"""

from __future__ import annotations

import os
import uuid
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension. The interleaved z-value must stay within the 63
#: value bits of a signed LongType (bit 63 is the sign bit and would
#: mis-order repartitionByRange), so ndims * bits <= 63: 16 bits covers
#: up to 3 dims; 4 dims need <= 15 bits (write_zordered auto-shrinks).
#: 2^15-2^16 cells per dimension is far finer than row-group
#: granularity needs.
DEFAULT_BITS = 16


def _cell(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Min-max normalize to an integer cell in [0, 2^bits)."""
    n_cells = 1 << bits
    if hi <= lo:  # constant dimension: every row in cell 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(hi - lo) * n_cells
    clamped = F.least(
        F.greatest(F.floor(scaled), F.lit(0)), F.lit(n_cells - 1)
    )
    return F.coalesce(clamped, F.lit(0)).cast("long")


def zorder_key(
    cells: list[Column], bits: int = DEFAULT_BITS
) -> Column:
    """Interleave the cell columns' bits into one Morton value.

    Bit ``i`` of dimension ``j`` lands at position ``i * ndims + j``:
    adjacent z-values differ in low-order bits of every dimension, which
    is the locality property row-group pruning exploits. Constant-shift
    ``getbit`` terms only -- whole-stage codegen, no shuffle.
    """
    ndims = len(cells)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cells):
        for i in range(bits):
            z = z + F.shiftleft(
                F.getbit(c, F.lit(i)).cast("long"), i * ndims + j
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as Parquet laid out along the Z-curve of ``cols``.

    One stats row, one range shuffle, one write. ``num_files`` sets the
    range partition count (at 100 TB, size it so files land near the
    row-group/HDFS-block sweet spot; combine with ``maxRecordsPerFile``
    for a hard upper bound). ``bits`` is auto-shrunk to ``63 //
    len(cols)`` so any dimension count fits the signed-long z-value
    (e.g. 4 cols at the 16-bit default run at 15 bits).
    """
    bits = min(bits, 63 // max(len(cols), 1))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    cells = [
        _cell(
            F.col(c),
            stats[f"lo_{i}"] if stats[f"lo_{i}"] is not None else 0.0,
            stats[f"hi_{i}"] if stats[f"hi_{i}"] is not None else 0.0,
            bits,
        )
        for i, c in enumerate(cols)
    ]
    (
        df.withColumn("__z", zorder_key(cells, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dest: str,
    num_files: int,
    sort_col: str | None = None,
) -> tuple[int, int]:
    """Small-file compaction -- the other half of table maintenance
    (Z-order fixes WHERE rows live; compaction fixes HOW MANY files
    they live in). Streaming appends and incremental runs accrete
    many small files; every downstream scan then pays per-file open
    cost and tiny row groups defeat footer-stats pruning.

    Rewrites ``src`` into ``num_files`` files at ``dest`` -- one range
    shuffle when ``sort_col`` is given (preserving/establishing a sort
    order so min/max stats stay tight), else a round-robin coalesce-
    style repartition. Returns (files_before, files_after). On Iceberg
    the same operation is ``rewrite_data_files``; this is the
    plain-Parquet rendering.
    """
    df = spark.read.parquet(src)
    before = _count_parquet_files(spark, src)
    out = (
        df.repartitionByRange(num_files, sort_col).sortWithinPartitions(
            sort_col
        )
        if sort_col is not None
        else df.repartition(num_files)
    )
    out.write.mode("overwrite").parquet(dest)
    return before, _count_parquet_files(spark, dest)


def _count_parquet_files(spark, path: str) -> int:
    """Actual data-file count via the Hadoop FileSystem (read-split
    counts would over-report: one large file scans as many splits)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return sum(
        1
        for st in fs.listStatus(p)
        if st.getPath().getName().endswith(".parquet")
    )


#: Documents per bucket for a curation run's shared bucket count (see
#: :func:`bucket_count_for`). Sized from the run's BIGGEST shared
#: table, the shingle index (~55-58 sid rows/doc x 24 B/row): 125k docs
#: ~ 170 MB of index per bucket -- inside the 100 MB - 1 GB band the
#: shuffle-partition guidance targets, and small enough that one bucket
#: of any doc_id table is a comfortable executor-memory join/sort unit.
DOCS_PER_BUCKET = 125_000

#: Bucket-count floor: every corpus at or below ~4M docs keeps the
#: historical 32, so oracle-scale renderings and the r9-r14 measured
#: layouts are unchanged; the count only grows past it.
BUCKET_FLOOR = 32


def bucket_count_for(n_rows: int | None, floor: int = BUCKET_FLOOR) -> int:
    """One bucket count per curation run, scaled with corpus size
    (r15, VERDICT r14 #1 -- the fixed 32 was the measured scale-killer:
    one-file-per-bucket caps the index WRITE at bucket_count tasks, so
    the 8M write ran exponent 2.2 with 463M rows through 32 writers,
    and the same constant caps every co-located join's parallelism).

    ``ceil(n_rows / DOCS_PER_BUCKET)`` rounded UP to a power of two,
    never below ``floor``. Power-of-two counts mean two tables bucketed
    at different generations still divide evenly, so
    ``spark.sql.bucketing.coalesceBucketsInJoin`` can co-locate them
    without a shuffle; within ONE run every table shares the single
    count computed here, so stage-to-stage joins stay exchange-free by
    construction (the N44 guarantee). ``None`` (unprobeable corpus)
    takes the floor -- sizing is a constant-factor layout choice, never
    a semantics question.
    """
    # Round the floor itself up to a power of two first: the doubling
    # loop below only preserves the documented power-of-two invariant
    # (relied on by coalesceBucketsInJoin co-location) when it starts
    # from one -- a caller's floor=48 must yield 64-style counts, not 96.
    pow2_floor = 1
    while pow2_floor < max(floor, 1):
        pow2_floor *= 2
    if n_rows is None or n_rows <= 0:
        return pow2_floor
    need = -(-n_rows // DOCS_PER_BUCKET)  # ceil
    count = pow2_floor
    while count < need:
        count *= 2
    return count


def write_bucketed(
    df,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    pre_partitioned: bool = False,
) -> None:
    """Write ``df`` as a BUCKETED (and, by default, bucket-sorted)
    managed table: rows are hash-partitioned into ``n_buckets`` files
    per write-task group BY THE JOIN KEY, and that physical layout is
    recorded in the catalog.

    Why this exists -- the other half of the layout story: z-order
    (above) buys scan PRUNING; bucketing buys JOIN CO-LOCATION. Two
    tables bucketed by the same key into the same bucket count join
    with ZERO Exchange on either side -- bucket i only ever meets
    bucket i -- and with ``sort=True`` the per-bucket sort is also
    pre-paid, so SortMergeJoin needs no Sort either. At 100 TB the
    facts-with-facts join (orders x lineitem and every incremental
    re-join after it) is usually the single largest shuffle in the
    pipeline; bucketing prices it ONCE at write time and every
    subsequent join reads the layout for free. The same contract
    Iceberg expresses as a ``bucket(N, key)`` partition transform
    (/root/reference README's hidden-partitioning surface); this is
    the plain-Spark catalog rendering.

    Shuffle-free-ness is PLAN-ASSERTED in tests/test_layout.py: the
    bucketed-x-bucketed join plan contains no Exchange (and no Sort
    when pre-sorted), while the identical unbucketed join carries two.
    Sort-elision additionally needs the reader to trust per-bucket
    order: Spark 3+ dropped that by default because a bucket split
    across files has no global order -- this writer guarantees ONE
    file per bucket (see the repartition note below), which makes
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` sound
    FOR ITS TABLES ONLY. The flag is session-global, and another
    bucketed table (written elsewhere, multiple files per bucket)
    read under it would feed SortMergeJoin unsorted input -- wrong
    results, not a bad plan. Never set it globally: wrap reads of
    this writer's tables in :func:`bucketed_sorted_reader`, which
    sets the flag for the enclosed plan BUILDS and restores the prior
    value on exit. (Exchange-free-only -- keeping the Sort, no flag
    needed -- is the always-safe default if scoping is impractical.)

    Sizing note (100 TB): pick n_buckets so one bucket of the BIGGER
    table fits an executor's memory slice (buckets are the unit of
    join-task work; too few buckets = giant tasks, too many = small
    files). Spark requires the bucket counts to match (or divide
    evenly with spark.sql.bucketing.coalesceBucketsInJoin.enabled) for
    the exchange-free plan.
    """
    if sort:
        # ONE file per bucket: bucketBy hashes rows to buckets inside
        # every write task, so T tasks leave T files per bucket and the
        # reader must re-Sort (it only trusts per-bucket order when a
        # bucket is a single file). repartition(n, key) uses the same
        # Murmur3-pmod hash as the bucket assignment, so each task
        # holds exactly one bucket's rows and writes exactly one file
        # -- the join plan then needs neither Exchange NOR Sort. The
        # trade: write parallelism is capped at n_buckets tasks (one
        # per bucket) -- acceptable because n_buckets is sized to make
        # buckets executor-memory-sized units of JOIN work anyway.
        # ``pre_partitioned=True`` is the caller's ASSERTION that the
        # frame already carries exactly this layout -- a
        # ``repartition(n_buckets, key)`` upstream with only
        # partitioning-preserving ops since (e.g. a window partitioned
        # by the key) -- so the builder can fold the bucket shuffle
        # into an exchange it was paying anyway. A wrong assertion
        # breaks one-file-per-bucket and with it the sorted-reader
        # contract (multi-file buckets read as sorted feed
        # SortMergeJoin unsorted input); tests pin the one honest
        # caller (materialize_shingle_index's cold build).
        if not pre_partitioned:
            df = df.repartition(n_buckets, F.col(key))
    if sort and mode == "append":
        # an append leaves >1 file per bucket: each is sorted, their
        # concatenation is NOT, and a reader trusting the legacy
        # outputOrdering flag would feed SortMergeJoin unsorted input
        # -- wrong JOIN RESULTS, not just a bad plan. Rewrite the
        # table (mode='overwrite') or append unsorted.
        raise ValueError(
            "append breaks the one-file-per-bucket sort guarantee; "
            "use mode='overwrite' or sort=False"
        )
    # Stale-location guard: with an in-memory catalog (tests, tools,
    # any restarted local session) a table written by a DEAD session is
    # gone from the catalog but its managed-location directory remains,
    # and saveAsTable then fails with LOCATION_ALREADY_EXISTS even in
    # overwrite mode (overwrite can only replace a table the catalog
    # KNOWS). A location whose table is absent from the catalog is by
    # construction debris -- no live reader can reference it -- so
    # remove it. Persistent-metastore deployments never hit this branch
    # (the table is in the catalog and overwrite handles it).
    spark = df.sparkSession
    try:
        catalog_impl = spark.conf.get("spark.sql.catalogImplementation")
    except Exception:
        # unreadable -> assume persistent and DON'T touch the location
        catalog_impl = "hive"
    debris, stale_prefix = None, None
    if (
        mode == "overwrite"
        # The dead-session-debris premise only holds for the IN-MEMORY
        # catalog: with a persistent metastore a location whose table
        # this session can't see may belong to a live table of another
        # session sharing the warehouse dir (r11 ADVICE) -- there,
        # surface Spark's own LOCATION_ALREADY_EXISTS.
        and catalog_impl == "in-memory"
        # UNQUALIFIED names in the default database only: a qualified
        # name's location is <warehouse>/<db>.db/<table>, so deriving
        # it from the bare table segment could point the cleanup at a
        # DIFFERENT live table's directory (r11 review) -- outside the
        # simple case, surface Spark's own LOCATION_ALREADY_EXISTS and
        # let the operator decide.
        and "." not in table
        and spark.catalog.currentDatabase() == "default"
    ):
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            loc = os.path.join(wh.path, table.lower())
            # remembered for the post-success sweep below; same safety
            # envelope as the rename (in-memory catalog, unqualified
            # name, default db, local warehouse)
            stale_prefix = f"{loc}.stale-"
            if not spark.catalog.tableExists(table) and os.path.isdir(
                loc
            ):
                # Rename aside instead of deleting: if the saveAsTable
                # below crashes mid-write, the prior files are still on
                # disk under the .stale name (recoverable) instead of
                # gone (r11 ADVICE); only a COMPLETED write removes
                # them.
                debris = f"{loc}.stale-{uuid.uuid4().hex[:8]}"
                os.rename(loc, debris)
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
    if stale_prefix is not None:
        import glob
        import shutil

        # A COMPLETED write retires not just this call's rename-aside
        # copy but every older <loc>.stale-* sibling left by previously
        # CRASHED writes (ADVICE r12): each was kept only so a crash
        # mid-write wouldn't lose the prior files; the table now has a
        # newer committed state, so the recovery copies are
        # unreferenced debris that would otherwise accumulate
        # unboundedly in the warehouse.
        for d in glob.glob(stale_prefix + "*"):
            shutil.rmtree(d, ignore_errors=True)


@contextmanager
def bucketed_sorted_reader(spark):
    """Scope ``spark.sql.legacy.bucketedTableScan.outputOrdering`` to
    reads of ``write_bucketed(sort=True)`` tables: sets the flag,
    yields, and ALWAYS restores the previous value (set or unset), so
    the session-global knob can never leak onto bucketed tables whose
    multi-file buckets would be mis-read as sorted.

    The flag matters at plan-BUILD time (the scan's outputOrdering is
    decided when the DataFrame is analyzed), so build the join inside
    the block; executing the returned frame later is fine. Like all
    session confs this is session-scoped, not thread-safe: concurrent
    plan builds on OTHER threads of the same session during the block
    would see the flag -- scope it tightly.
    """
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
