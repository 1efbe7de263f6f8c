"""Pluggable batch ingestion -- the reference's extractor re-expressed.

The reference's primary entry point is a PySpark job that fetches Bitcoin
prices from three public HTTP APIs and appends one micro-batch to the raw
table (/root/reference/Iceberg-dbt-project/scripts/
extract_bitcoin_prices.py). Its control semantics, reproduced here exactly
(SURVEY.md §2.1 S1-S5):

- S1-S3  three sources with per-source PARSE rules: CoinGecko's flat dict
  (:40-67), CoinCap's string->float casts plus fixed-FX derivation
  eur = usd*0.85 / brl = usd*5.50 (:70-92), Blockchain.info's nested
  ticker with NULL padding for the fields it lacks (:95-115).
- S4  per-source failure isolation: one source failing (transport OR
  parse) drops that record only; the batch aborts only when ALL sources
  fail (:65-67,90-92,113-115,174-177).
- one timestamp PER BATCH, stamped once before fetching, shared by every
  surviving row (:151,156,163,170) -- not per-row now().
- S5  rows -> DataFrame lift through an explicit 9-field StructType
  (:180-192).

Transport is INJECTABLE: a source couples a ``fetch`` callable (returns
the raw JSON-ish payload) with a ``parse`` callable (payload -> record).
Tests inject fakes; production injects thin HTTP closures. The engine
never imports an HTTP client itself.

Scale note: this is a driver-side micro-batch collector by design (3
rows/batch in the reference); the 100 TB path for many-endpoint fan-out
is ``spark.createDataFrame(urls).mapInPandas(fetch_batch)`` so executors
fetch in parallel -- same parse/isolation semantics, applied per
partition.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Mapping
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Exact mirror of the reference's declared schema
#: (extract_bitcoin_prices.py:180-190).
BITCOIN_SCHEMA = StructType(
    [
        StructField("source", StringType(), True),
        StructField("symbol", StringType(), True),
        StructField("price_usd", DoubleType(), True),
        StructField("price_eur", DoubleType(), True),
        StructField("price_brl", DoubleType(), True),
        StructField("market_cap_usd", DoubleType(), True),
        StructField("volume_24h_usd", DoubleType(), True),
        StructField("change_24h_pct", DoubleType(), True),
        StructField("extracted_at", TimestampType(), True),
    ]
)

Payload = Mapping[str, Any]


@dataclass(frozen=True)
class BatchSource:
    """One ingestion source: a named (transport, parse) pair."""

    name: str
    fetch: Callable[[], Payload]
    parse: Callable[[Payload], dict]


def parse_coingecko(payload: Payload) -> dict:
    """CoinGecko simple-price: flat dict, tolerant ``.get`` access
    (extract_bitcoin_prices.py:53-64)."""
    data = payload["bitcoin"]
    return {
        "source": "coingecko",
        "symbol": "BTC",
        "price_usd": data.get("usd"),
        "price_eur": data.get("eur"),
        "price_brl": data.get("brl"),
        "market_cap_usd": data.get("usd_market_cap"),
        "volume_24h_usd": data.get("usd_24h_vol"),
        "change_24h_pct": data.get("usd_24h_change"),
    }


def parse_coincap(payload: Payload) -> dict:
    """CoinCap asset: string fields cast to float, EUR/BRL derived by the
    fixed FX factors 0.85 / 5.50 (extract_bitcoin_prices.py:78-88)."""
    data = payload["data"]
    price_usd = float(data.get("priceUsd", 0))
    return {
        "source": "coincap",
        "symbol": "BTC",
        "price_usd": price_usd,
        "price_eur": price_usd * 0.85,
        "price_brl": price_usd * 5.50,
        "market_cap_usd": float(data.get("marketCapUsd", 0)),
        "volume_24h_usd": float(data.get("volumeUsd24Hr", 0)),
        "change_24h_pct": float(data.get("changePercent24Hr", 0)),
    }


def parse_blockchain_info(payload: Payload) -> dict:
    """Blockchain.info ticker: nested ``[ccy]["last"]`` access, NULL
    padding for the three fields the API lacks
    (extract_bitcoin_prices.py:101-111)."""
    return {
        "source": "blockchain_info",
        "symbol": "BTC",
        "price_usd": payload["USD"]["last"],
        "price_eur": payload["EUR"]["last"],
        "price_brl": payload["BRL"]["last"],
        "market_cap_usd": None,
        "volume_24h_usd": None,
        "change_24h_pct": None,
    }


def standard_sources(
    fetchers: Mapping[str, Callable[[], Payload]],
) -> list[BatchSource]:
    """The reference's three sources with injected transports.

    ``fetchers`` maps source name -> zero-arg callable returning the raw
    payload (in production a requests closure; in tests a fake).
    """
    parsers = {
        "coingecko": parse_coingecko,
        "coincap": parse_coincap,
        "blockchain_info": parse_blockchain_info,
    }
    return [
        BatchSource(name=n, fetch=fetchers[n], parse=parsers[n])
        for n in ("coingecko", "coincap", "blockchain_info")
        if n in fetchers
    ]


def extract_batch(
    spark: SparkSession,
    sources: list[BatchSource],
    *,
    now: dt.datetime | None = None,
) -> DataFrame | None:
    """Collect one micro-batch across sources (the extractor's main loop,
    extract_bitcoin_prices.py:148-192).

    Returns ``None`` when every source failed (the reference's
    abort-if-empty guard, :174-177) -- callers skip the append for that
    cycle. ``now`` pins the batch timestamp for deterministic tests; by
    default one UTC instant is stamped per batch, before fetching.
    """
    extracted_at = now or dt.datetime.now(dt.timezone.utc)
    records: list[dict] = []
    for s in sources:
        try:
            rec = s.parse(s.fetch())
        except Exception:
            # Per-source isolation (S4): a failed transport or a payload
            # that doesn't parse drops this source from the batch only.
            continue
        rec["extracted_at"] = extracted_at
        records.append(rec)
    if not records:
        return None
    rows = [tuple(r.get(f.name) for f in BITCOIN_SCHEMA.fields) for r in records]
    return spark.createDataFrame(rows, BITCOIN_SCHEMA)
