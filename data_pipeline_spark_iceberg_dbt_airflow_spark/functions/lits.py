"""Fast construction of (nested) array literals for model inlining.

The literal-inlining pattern (k-means centroids, PQ codebooks, LSH
plane matrices -- models small enough to live in the plan instead of a
broadcast join) has a hidden driver-side cost in PySpark: both
``F.array(*[F.lit(x) ...])`` and ``F.lit([...])`` (which recursively
expands to per-element ``lit`` calls) pay ONE py4j round trip per
element. A 512-double PQ codebook costs ~0.4s of socket chatter per
reference; profiled in round 6, this -- not Catalyst, not execution --
dominated sim_ann_family's build phase.

``array_lit`` renders the whole nested structure as a single SQL
``array(array(...))`` expression string and crosses py4j ONCE;
Spark's parser materializes it JVM-side in one pass. ``repr(float)``
guarantees shortest-round-trip decimal text and Spark parses double
literals to the nearest double, so values survive bit-exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql(v) -> str:
    if isinstance(v, (list, tuple)):
        if not v:
            # untyped array() would infer array<string>; all callers
            # inline numeric models, so make emptiness loud instead
            raise ValueError("array_lit does not support empty arrays")
        return "array(" + ",".join(_sql(x) for x in v) + ")"
    f = float(v)
    if not math.isfinite(f):
        raise ValueError(f"array_lit requires finite values, got {f}")
    return repr(f) + "D"


def array_sql(values) -> str:
    """The SQL text of a (nested) DOUBLE array literal, for callers
    that assemble whole expressions as strings (one parse, zero
    per-element py4j): non-empty (nested) finite numbers, every leaf
    coerced to double."""
    return _sql(values)


def array_lit(values) -> Column:
    """A (nested) DOUBLE array literal as one expression, one py4j
    round trip. ``values`` is a non-empty (nested) sequence of finite
    numbers; every leaf is coerced to double."""
    return F.expr(_sql(values))
