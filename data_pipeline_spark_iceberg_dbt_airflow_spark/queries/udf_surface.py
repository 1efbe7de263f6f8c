"""Registry entries for the UDF and multimodal surfaces (SURVEY.md §2.10).

The operators live in ``operators/``; these entries expose them through
the driver contract so the differential harness checks them: the row UDF
(X1) against a built-in CASE oracle, and the multimodal pipeline (X2) as
a three-branch marker query. Round-4 fix: every output column is a
SCALAR (the round-3 ``array<double>`` feature column crashed the
driver's pandas canonicalizer with ``unhashable type: 'list'``), and the
whole entry is now hash-oracled -- including the decode branch, because
the stubbed codec is sha256-derived (operators/multimodal.py:65-78) and
DuckDB's ``sha256()`` computes the identical digest, so the oracle can
reproduce the kernel's output exactly in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..operators import (
    doc_bands,
    extract_features,
    extract_frame_features,
    resize_meta,
    sample_frames,
    synth_media,
)
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


# Registry renderings of the multimodal pipeline (parameters shared by the
# Spark query and the oracle below).
_RESIZE_MAX_W = 96
_RESIZE_MAX_H = 64
_FRAME_EVERY_MS = 500

# Decode branch oracle: the stub codec's feature f_i is sha256(payload)
# byte i / 255.0; the query rescales to the exact byte (round(f_i*255)),
# and DuckDB recovers the same byte from its hex digest, one nibble pair
# per feature: 16*hex(2i+1) + hex(2i+2).
_HEX = "0123456789abcdef"


def _digest_bytes_sql(col: str, n_bytes: int, first_alias: int) -> str:
    """SQL extracting digest bytes 0..n_bytes-1 of hex column ``col`` as
    BIGINT aliases v{first_alias}..v{first_alias+n_bytes-1}."""
    return ",\n               ".join(
        f"(strpos('{_HEX}', substr({col}, {2 * i + 1}, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({col}, {2 * i + 2}, 1)) - 1)"
        f" AS v{first_alias + i}"
        for i in range(n_bytes)
    )


_DECODE_BYTES_SQL = _digest_bytes_sql("h", 8, 1)

_MULTIMODAL_ORACLE = f"""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               COALESCE(text, '') AS payload_text,
               CAST(doc_id % 640 + 16 AS INT) AS width,
               CAST(doc_id % 480 + 16 AS INT) AS height,
               CAST(n_chars * 10 AS INT) AS duration_ms
        FROM documents
    ),
    dec AS (SELECT media_id, kind, sha256(payload_text) AS h FROM media)
    SELECT 'decode' AS branch, media_id, kind,
           {_DECODE_BYTES_SQL}
    FROM dec
    UNION ALL
    SELECT 'resize' AS branch, media_id, kind,
           CAST(FLOOR(width * LEAST({_RESIZE_MAX_W} / CAST(width AS DOUBLE),
                                    {_RESIZE_MAX_H} / CAST(height AS DOUBLE),
                                    1.0)) AS BIGINT) AS v1,
           CAST(FLOOR(height * LEAST({_RESIZE_MAX_W} / CAST(width AS DOUBLE),
                                     {_RESIZE_MAX_H} / CAST(height AS DOUBLE),
                                     1.0)) AS BIGINT) AS v2,
           CAST(duration_ms AS BIGINT) AS v3,
           CAST(NULL AS BIGINT) AS v4, CAST(NULL AS BIGINT) AS v5,
           CAST(NULL AS BIGINT) AS v6, CAST(NULL AS BIGINT) AS v7,
           CAST(NULL AS BIGINT) AS v8
    FROM media
    UNION ALL
    SELECT 'frames' AS branch, media_id, 'video' AS kind,
           CAST(f.frame_no AS BIGINT) AS v1,
           CAST(f.frame_no * {_FRAME_EVERY_MS} AS BIGINT) AS v2,
           CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4,
           CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6,
           CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8
    FROM media,
         UNNEST(range(0, CAST(FLOOR(GREATEST(
             (duration_ms - 1) / {_FRAME_EVERY_MS}.0, 0)) AS BIGINT) + 1))
         AS f(frame_no)
    WHERE kind = 'video'
    UNION ALL
    SELECT 'framefeat' AS branch, media_id, 'video' AS kind,
           CAST(frame_no AS BIGINT) AS v1,
           {{FF_BYTES}}
    FROM (SELECT media_id, f.frame_no,
                 sha256(payload_text || '|' || CAST(f.frame_no AS VARCHAR))
                     AS h2
          FROM media,
               UNNEST(range(0, CAST(FLOOR(GREATEST(
                   (duration_ms - 1) / {_FRAME_EVERY_MS}.0, 0))
                   AS BIGINT) + 1)) AS f(frame_no)
          WHERE kind = 'video')
""".replace("{FF_BYTES}", _digest_bytes_sql("h2", 7, 2))


@register(
    "multimodal_features",
    oracle=_MULTIMODAL_ORACLE,
    doc="X2 multimodal pipeline, three-branch marker query over one "
    "synthesized media table (operators/multimodal.py). branch='decode' "
    "runs the real mapInPandas Arrow kernel (stub sha256 codec) and "
    "rescales each feature back to its digest byte so every column is a "
    "hashable scalar -- the round-3 array<double> output crashed the "
    "driver canonicalizer; the oracle reproduces the digest bytes via "
    "DuckDB sha256 + hex-nibble arithmetic, making the Python kernel "
    "itself hash-checked. branch='resize' is the aspect-preserving clamp "
    "(pure JVM codegen; floor/least double math identical across "
    "engines). branch='frames' is metadata-only frame sampling (sequence "
    "+ posexplode vs UNNEST(range)). Payload bytes feed exactly one "
    "Arrow pass and never flow downstream; resize/frames branches read "
    "metadata only, so Catalyst prunes the payload column from their "
    "scans. Scale: decode is embarrassingly parallel (one pass, batch "
    "size bounded by arrow.maxRecordsPerBatch); the explode emits "
    "frame indices, never duplicated payloads.",
    tags=("multimodal", "x2"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, read_table(spark, sf_dir, "documents"))
    null_v = [F.lit(None).cast("bigint").alias(f"v{i}") for i in range(4, 9)]

    feats = extract_features(media)
    dec = feats.select(
        F.lit("decode").alias("branch"),
        "media_id",
        "kind",
        *[
            F.round(F.col("feature")[i] * 255)
            .cast("bigint")
            .alias(f"v{i + 1}")
            for i in range(8)
        ],
    )

    rm = resize_meta(media, _RESIZE_MAX_W, _RESIZE_MAX_H)
    res = rm.select(
        F.lit("resize").alias("branch"),
        "media_id",
        "kind",
        F.col("meta.width").cast("bigint").alias("v1"),
        F.col("meta.height").cast("bigint").alias("v2"),
        F.col("meta.duration_ms").cast("bigint").alias("v3"),
        *null_v,
    )

    fr = sample_frames(media, _FRAME_EVERY_MS)
    frames = fr.select(
        F.lit("frames").alias("branch"),
        "media_id",
        F.lit("video").alias("kind"),
        F.col("frame_no").cast("bigint").alias("v1"),
        F.col("frame_ms").cast("bigint").alias("v2"),
        F.lit(None).cast("bigint").alias("v3"),
        *null_v,
    )

    # branch='framefeat' (round 4): the PER-FRAME decode kernel --
    # frames explode inside the Arrow pass (operators/multimodal.py
    # extract_frame_features), v1 = frame index, v2..v8 = the first 7
    # digest bytes of the frame-salted stub codec, which the oracle
    # reproduces via sha256(text || '|' || frame_no).
    ff = extract_frame_features(media, _FRAME_EVERY_MS)
    framefeat = ff.select(
        F.lit("framefeat").alias("branch"),
        "media_id",
        F.lit("video").alias("kind"),
        F.col("frame_no").cast("bigint").alias("v1"),
        *[
            F.round(F.col("feature")[i] * 255)
            .cast("bigint")
            .alias(f"v{i + 2}")
            for i in range(7)
        ],
    )

    return (
        dec.unionByName(res).unionByName(frames).unionByName(framefeat)
    )
