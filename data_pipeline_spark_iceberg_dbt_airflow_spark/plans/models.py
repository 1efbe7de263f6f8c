"""The reference's dbt models re-expressed as pure DataFrame transforms.

The reference materializes two SQL models through dbt over the Spark Thrift
server (SURVEY.md §2.11, §3.2); the model SQL survives in the reference
README (`/root/reference/README.md:368-400`, EN mirror :777-811):

- ``stg_bitcoin_prices``: column renames (P1), COALESCE-to-0 null canonical-
  ization over the six numeric columns (P2), and a derived
  ``extraction_date = DATE(extracted_at)`` (P3).
- ``fct_bitcoin_daily``: GROUP BY (extraction_date, data_source,
  crypto_symbol) with MIN/MAX/AVG(price_usd) + COUNT(*) (A1).

Here each model is a pure ``DataFrame -> DataFrame`` function -- the PySpark
rendering of a dbt model; ``{{ ref(...) }}`` becomes function composition (or
the registry in ``runner.py``). Catalyst gives the same partial+final
HashAggregate physical plan the Thrift server produced (SURVEY.md §4).

Scale notes: the fct aggregation is a single shuffle on the (low-cardinality)
group keys with map-side partial aggregation; at 100 TB the only concern is
group-key skew, which AQE's skewed-partition splitting handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import det

#: numeric columns the staging model COALESCEs to 0 (README.md:375-380)
_NUMERIC_COLS = (
    "price_usd",
    "price_eur",
    "price_brl",
    "market_cap_usd",
    "volume_24h_usd",
    "change_24h_pct",
)


def stg_from_raw(raw: DataFrame) -> DataFrame:
    """``stg_bitcoin_prices`` (README.md:368-384).

    SELECT source AS data_source, symbol AS crypto_symbol,
           COALESCE(<num>, 0) x6, change_24h_pct AS price_change_24h_pct,
           extracted_at, DATE(extracted_at) AS extraction_date
    """
    renamed = {
        "source": "data_source",
        "symbol": "crypto_symbol",
        "change_24h_pct": "price_change_24h_pct",
    }
    cols = []
    for c in ("source", "symbol"):
        cols.append(F.col(c).alias(renamed[c]))
    for c in _NUMERIC_COLS:
        cols.append(F.coalesce(F.col(c), F.lit(0.0)).alias(renamed.get(c, c)))
    cols.append(F.col("extracted_at"))
    cols.append(F.to_date("extracted_at").alias("extraction_date"))
    return raw.select(*cols)


def fct_daily(
    stg: DataFrame,
    *,
    group_keys: tuple[str, ...] = ("extraction_date", "data_source", "crypto_symbol"),
    price_col: str = "price_usd",
) -> DataFrame:
    """``fct_bitcoin_daily`` (README.md:386-400): daily per-source OHLC-lite.

    Parameterized on keys/measure so the same transform serves both the
    bitcoin fixture schema and the driver's ``events`` table (FIXTURES.md
    maps ts/event_type/value ≅ extracted_at/source/price_usd).
    """
    return stg.groupBy(*group_keys).agg(
        F.min(price_col).alias(f"min_{price_col}"),
        F.max(price_col).alias(f"max_{price_col}"),
        # det.davg, not F.avg: the oracle-checked flagship accumulates in
        # exact DECIMAL (functions/det.py) so the runner-rendered model
        # hash-matches it bit-for-bit regardless of partition order.
        det.davg(price_col).alias(f"avg_{price_col}"),
        F.count(F.lit(1)).alias("records"),
    )
