"""Count-min sketch: sublinear frequency estimates and heavy hitters.

Exact per-token counts over a 100 TB corpus shuffle one row per DISTINCT
token -- billions of rows of Zipf tail for a question ("which tokens are
frequent? roughly how frequent?") that tolerates one-sided error. The
count-min sketch answers it in ``depth x width`` cells: estimates never
undercount, and overcount by at most ``e/width * N`` with probability
``1 - e^-depth`` (Cormode & Muthukrishnan 2005). Spark ships
``df.stat.countMinSketch``, but that returns a driver-side JVM object;
this rendering keeps the sketch a DATAFRAME so it stays joinable,
persistable, and mergeable (two corpora's sketches union + re-sum).

Plan shapes:
- **Build**: explode each token to its ``depth`` (row, bucket) cells
  (xxhash64 channels, pmod width) and SUM -- one map-side-combinable
  shuffle of at most depth*width groups. Sketches of shards merge by
  unioning cell tables and re-summing: the aggregation is the merge.
- **Estimate**: probe tokens explode to their depth cells map-side, one
  broadcast equi-join against the cell table, then groupBy(token) MIN
  over rows. The corpus is never re-touched.
- **Heavy hitters**: candidate tokens (from any cheap pass -- here the
  probe set is the distinct tokens of a sample, at scale a sampled
  scan) filtered on estimate >= phi*N. CMS guarantees no false
  NEGATIVES among candidates (estimates only overcount), the property
  a stop-shingle / stopword / hot-key detector needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4

#: Distinct per-row hash channels (same fixed-seed discipline as the
#: bloom operator's _SEED_BASE).
_CMS_SEED = 0x5BD1E995


def _cells(token: Column, width: int, depth: int) -> Column:
    """array<struct<row, bucket>> of the token's sketch cells."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                F.pmod(
                    F.xxhash64(token, F.lit(_CMS_SEED + d)), F.lit(width)
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    tokens: DataFrame,
    token_col: str,
    width: int,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Sketch the token stream into a (row, bucket, cnt) cell table.

    One combinable shuffle of <= depth*width groups regardless of corpus
    size. NULL tokens are skipped (they are not countable items).
    """
    return (
        tokens.where(F.col(token_col).isNotNull())
        .select(F.explode(_cells(F.col(token_col), width, depth)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    width: int,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Per-probe-token frequency estimate: min over the token's cells.

    ``probes`` should be distinct tokens; output adds ``est``. A cell
    the sketch never touched means count 0 (the left join's NULL).
    """
    exploded = probes.where(F.col(token_col).isNotNull()).select(
        token_col,
        F.explode(_cells(F.col(token_col), width, depth)).alias("c"),
    )
    joined = exploded.join(
        F.broadcast(sketch),
        (F.col("c.row") == F.col("row")) & (F.col("c.bucket") == F.col("bucket")),
        "left",
    )
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )


def cms_heavy_hitters(
    sketch: DataFrame,
    candidates: DataFrame,
    token_col: str,
    width: int,
    total: int,
    phi: float,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Candidates whose estimated frequency is >= phi * total.

    One-sided: every TRUE heavy hitter among the candidates survives
    (estimates never undercount); some near-threshold tokens may ride
    along, bounded by the sketch's e/width * total overcount.
    """
    return cms_estimate(sketch, candidates, token_col, width, depth).where(
        F.col("est") >= float(phi) * float(total)
    )
