"""Skew-salted two-phase aggregation (reusable operator).

A naive ``groupBy(keys)`` funnels every row of a hot key through one
reducer -- the classic straggler at scale (brief: "skewed keys hurt ...
salting for skew"). This operator runs the standard rewrite for
COMBINABLE measures (count / sum / min / max):

  phase 1: groupBy(keys + salt)  -- the salt spreads each hot key over
           ``buckets`` reducers, so no reducer sees more than ~1/buckets
           of the hot key's rows;
  phase 2: groupBy(keys) over the (keys x buckets) partials -- a
           negligible re-aggregation.

The rewrite is exact, not approximate: counts re-sum, sums re-sum
(callers pass DECIMAL-cast expressions when they need order-independent
float totals -- see functions/det.py), mins re-min, maxes re-max. AVG is
deliberately NOT offered as a measure: re-averaging averages is wrong;
compute it from an exact sum and count in the caller's select.

The salt must be a deterministic row expression (an id column, a hash of
row attributes) -- NOT rand(): nondeterministic salts break retry/replay
semantics when a task is re-executed after partial failure.

Used by the registry query ``agg_events_by_type``, whose oracle computes
the DIRECT groupBy -- the driver's value-hash equality is a standing
proof that the rewrite preserves semantics.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    *,
    salt: Column,
    buckets: int = 16,
    count_alias: str | None = None,
    sums: Mapping[str, Column] | None = None,
    mins: Mapping[str, Column] | None = None,
    maxes: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Exact groupBy(keys) aggregation, executed skew-resistantly.

    ``sums`` / ``mins`` / ``maxes`` map output column names to input
    expressions; ``count_alias`` names a COUNT(*) output. Output schema is
    keys + the named measures (sums keep the widened type of the phase-2
    re-sum; cast in the caller if needed).
    """
    sums = dict(sums or {})
    mins = dict(mins or {})
    maxes = dict(maxes or {})
    if not (sums or mins or maxes or count_alias):
        raise ValueError("no measures given")
    p1 = []
    if count_alias:
        p1.append(F.count(F.lit(1)).alias("__cnt"))
    p1 += [F.sum(c).alias(f"__s_{n}") for n, c in sums.items()]
    p1 += [F.min(c).alias(f"__mn_{n}") for n, c in mins.items()]
    p1 += [F.max(c).alias(f"__mx_{n}") for n, c in maxes.items()]
    # pmod, not %: Spark's remainder preserves sign, so a signed salt
    # expression (hash()/xxhash64) under % would fan out to 2*buckets-1
    # distinct values and weaken the ~1/buckets-per-reducer guarantee.
    partial = (
        df.withColumn("__salt", F.pmod(salt, F.lit(buckets)))
        .groupBy(*keys, "__salt")
        .agg(*p1)
    )
    p2 = []
    if count_alias:
        p2.append(F.sum("__cnt").alias(count_alias))
    p2 += [F.sum(f"__s_{n}").alias(n) for n in sums]
    p2 += [F.min(f"__mn_{n}").alias(n) for n in mins]
    p2 += [F.max(f"__mx_{n}").alias(n) for n in maxes]
    return partial.groupBy(*keys).agg(*p2)
