"""Central query registry.

Every operator claimed as implemented (SURVEY.md §2) registers here with a
PySpark implementation and, when SQL-expressible, an ANSI-SQL oracle string
DuckDB can run over the same parquet tables. ``__spark_entry__.queries()`` /
``oracle_sql()`` and the in-repo differential tests both iterate this one
registry, so local pytest exercises exactly the contract the driver checks.

Column-name discipline: the driver's comparator sorts columns by name before
hashing, so the Spark implementation and the oracle MUST alias every computed
column identically. Float discipline: DOUBLE aggregates are never computed as
float sums -- both sides accumulate in exact DECIMAL via functions/det.py
(``dsum``/``davg``/... and their ``oracle_*`` renderings use the identical
formula), so results are order-independent and bit-identical across engines;
plain ROUND over double expressions is avoided (cross-engine half-boundary
behavior differs -- use a DECIMAL cast instead, see det.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    *,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, spark_fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench, tags=tags,
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules lazily to avoid circular imports.
    from . import _load_all  # noqa: PLC0415

    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
