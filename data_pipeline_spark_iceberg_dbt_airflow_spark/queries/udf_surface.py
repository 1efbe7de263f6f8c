"""Registry entries for the UDF and multimodal surfaces (SURVEY.md §2.10).

The operators live in ``operators/``; these entries expose them through
the driver contract so the differential harness checks them: the row UDF
(X1) against a built-in CASE oracle, and the multimodal feature pipeline
as a rows-only check (its decode stub is engine-side Python by design --
no SQL oracle can express it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table
from ..operators import doc_bands, extract_features, synth_media
from ..operators.udfs import LONG, SHORT
from .registry import register


@register(
    "udf_doc_bands",
    oracle=f"""
        SELECT doc_id, n_chars,
               CASE WHEN n_chars IS NULL THEN NULL
                    WHEN n_chars < {SHORT} THEN 'short'
                    WHEN n_chars < {LONG} THEN 'medium'
                    ELSE 'long' END AS band
        FROM documents
    """,
    doc="X1 row-UDF surface: per-row Python classification of documents "
    "into length bands, oracle-checked against the equivalent CASE "
    "expression. Deliberately NOT bench-marked: BatchEvalPython is the "
    "slow path (plan-asserted in tests); hot paths use the built-in or "
    "pandas tier (operators/udfs.py).",
    tags=("udf", "x1"),
)
def udf_doc_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_bands(read_table(spark, sf_dir, "documents"), impl="udf")


@register(
    "multimodal_features",
    oracle=None,  # decode kernel is engine-side Python by design
    doc="Multimodal plumbing: synthesize a binary media table from the "
    "corpus (payload + typed metadata struct), decode + feature-extract "
    "via one mapInPandas pass (stubbed deterministic codec), emit "
    "metadata-plus-features with payload bytes dropped. Rows-only check; "
    "determinism and batch shape are pytest-asserted "
    "(tests/test_operators.py).",
    tags=("multimodal", "x2"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, read_table(spark, sf_dir, "documents"))
    return extract_features(media)
