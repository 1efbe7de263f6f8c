"""Sorts (SURVEY.md §2.6 O3, [ext]).

The reference's only orderings are top-k verification reads (O1/O2,
extract_bitcoin_prices.py:203, README.md:297) -- covered in reference.py.
Here: the global sort completion. The partition-local variant
(``sortWithinPartitions``) is content-identical to its input by definition,
so it spends no registry slot (round-3 budget); its physical shape -- a
Sort node with NO range exchange -- is what matters and is plan-asserted
in tests/test_plans.py and exercised by sorted-parquet writes in
tests/test_ingest_pipeline.py.

Scale notes: a global orderBy is a range-partitioned exchange (sampled
boundaries) + per-partition sort -- the most expensive shuffle shape there
is; use it only when the OUTPUT must be totally ordered. When downstream
work is per-partition (e.g. writing sorted parquet row groups),
sortWithinPartitions gives the locality without the range exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register


@register(
    "sort_global_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    doc="O3 global sort without limit: range-partitioned exchange + local "
    "sort (Exchange rangepartitioning in the plan). The comparator is "
    "order-insensitive, so correctness checks content; the ORDER BY "
    "exercises the physical path. The partition-local variant "
    "(sortWithinPartitions: Sort node, no Exchange) is plan-asserted in "
    "tests/test_plans.py.",
    bench=True,
    tags=("sort",),
)
def sort_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
