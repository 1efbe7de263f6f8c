"""UDF surface (SURVEY.md §2.10, [ext]): row UDF (X1) and the vectorized
paths (X2).

The reference registers no UDFs -- its Python fetchers run driver-side
before Spark (extract_bitcoin_prices.py:40-115). The capability envelope
still includes the full UDF surface; this module provides both tiers with
the cost model stated plainly:

- X1 row UDF (``F.udf``): one Python call PER ROW through pickle --
  10-100x slower than built-ins or pandas_udf. Exists for interop
  completeness (third-party row-wise libraries); NEVER the hot path.
  The plan shows ``BatchEvalPython`` -- if that node sits under a big
  scan, the query is wrong.
- X2 vectorized (``F.pandas_udf`` / ``mapInPandas``): Arrow-batched,
  NumPy-speed kernels. The production Python path (see also
  queries/similarity.py and operators/multimodal.py).

Both implement the same quality-band function so tests can assert the
tiers agree row-for-row, and a built-in-expression rendering exists for
the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: char-count band edges: [0, SHORT) -> short, [SHORT, LONG) -> medium
SHORT, LONG = 200, 400


def band_of(n_chars: int | None) -> str | None:
    """The scalar function all three renderings share. NULL in -> NULL
    out (SQL propagation; a bare ELSE would misfile NULL as 'long')."""
    if n_chars is None:
        return None
    if n_chars < SHORT:
        return "short"
    if n_chars < LONG:
        return "medium"
    return "long"


def band_udf() -> Column:
    """X1: row UDF. Built per-call (PySpark 4 resolves types eagerly)."""
    return F.udf(band_of, "string")(F.col("n_chars"))


def band_pandas_udf() -> Column:
    """X2: vectorized pandas_udf over the same function."""

    def kernel(n: pd.Series) -> pd.Series:
        out = pd.cut(
            n,
            bins=[-1, SHORT - 1, LONG - 1, float("inf")],
            labels=["short", "medium", "long"],
        ).astype(object)
        out[n.isna()] = None  # pd.cut leaves NaN; astype(str) would stringify
        return out

    return F.pandas_udf(kernel, "string")(F.col("n_chars"))


def band_builtin() -> Column:
    """The built-in-expression rendering (what the hot path should use,
    and what the DuckDB oracle mirrors)."""
    return (
        F.when(F.col("n_chars").isNull(), F.lit(None).cast("string"))
        .when(F.col("n_chars") < SHORT, "short")
        .when(F.col("n_chars") < LONG, "medium")
        .otherwise("long")
    )


def doc_bands(docs: DataFrame, impl: str = "builtin") -> DataFrame:
    """documents + a ``band`` column via the chosen implementation tier."""
    col = {"udf": band_udf, "pandas": band_pandas_udf, "builtin": band_builtin}[
        impl
    ]()
    return docs.select("doc_id", "n_chars", col.alias("band"))


def doc_bands_mapinpandas(docs: DataFrame) -> DataFrame:
    """X2 via mapInPandas: whole-partition Arrow batches in, batches out.

    Same result as ``doc_bands``; the shape to use when the kernel needs
    row-set context (model inference with shared weights, batch encoders)
    rather than a per-column function.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b[["doc_id", "n_chars"]].copy()
            band = pd.cut(
                b["n_chars"],
                bins=[-1, SHORT - 1, LONG - 1, float("inf")],
                labels=["short", "medium", "long"],
            ).astype(object)
            band[b["n_chars"].isna()] = None
            out["band"] = band
            yield out

    return docs.mapInPandas(fn, "doc_id bigint, n_chars bigint, band string")
