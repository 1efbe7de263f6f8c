"""Batch ingestion sources (SURVEY.md §2.1 S1-S5)."""

from .ingest import (  # noqa: F401
    BITCOIN_SCHEMA,
    BatchSource,
    extract_batch,
    parse_blockchain_info,
    parse_coincap,
    parse_coingecko,
    standard_sources,
)
