"""Multimodal (image/audio/video) column operators.

Training-data pipelines carry media as opaque ``binary`` columns with
typed metadata structs; the engine's job is the Spark-side plumbing --
schema, partitioning, Arrow batch shape -- while the codec work happens
in per-batch Python kernels. The decode step is STUBBED here (the image/
audio libraries are not in this container): ``decode_media`` raises
``NotImplementedError`` unless the deterministic fake is requested, and
every kernel routes through it, so swapping in a real codec is a
one-function change. Everything around the stub is real and tested.

Scale notes:
- Media rows are LARGE (payload bytes dominate). Operators project
  metadata-only wherever possible and carry the payload through exactly
  one mapInPandas pass; ``spark.sql.files.maxPartitionBytes`` and
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` size the Arrow batches
  so a partition of payloads fits executor memory.
- Frame sampling EXPLODES rows (one per sampled frame) but emits
  frame-index + feature columns, never duplicated payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media table: opaque payload + typed metadata (the lakehouse pattern for
#: multimodal corpora -- metadata queryable/prunable, bytes opaque).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def decode_media(payload: bytes, codec: str, *, fake: bool = True) -> np.ndarray:
    """STUB decode: real codecs are not available in this environment.

    With ``fake=True`` (tests) returns a deterministic pseudo-signal
    derived from the payload digest -- stable across runs and engines.
    A deployment replaces this body with PIL/ffmpeg/soundfile decode.
    """
    if not fake:
        raise NotImplementedError(
            f"no {codec!r} codec in this environment; inject a real decoder"
        )
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    return arr / 255.0  # 32 deterministic samples in [0, 1]


def synth_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: payload bytes derived from document
    text (the corpus stands in for a binary-asset table, which the driver
    testdata does not include)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Decode + feature-extract per media row via one mapInPandas pass.

    Output: (media_id, kind, feature array<double>) -- payload bytes do
    NOT flow downstream. The kernel sees Arrow batches of full rows;
    features are the first ``dim`` samples of the decoded signal.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                decode_media(p, c)[:dim].tolist()
                for p, c in zip(b["payload"], b["meta"].map(lambda m: m["codec"]))
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(
        fn, "media_id bigint, kind string, feature array<double>"
    )


def extract_frame_features(
    media: DataFrame, every_ms: int, dim: int = FEATURE_DIM
) -> DataFrame:
    """Per-FRAME features for video rows: decode + sample + featurize in
    ONE mapInPandas pass, exploding frames INSIDE the Arrow kernel.

    The naive composition -- ``sample_frames`` (frame index rows) joined
    back to payloads, then a per-frame decode pass -- would shuffle or
    re-broadcast the payload BYTES once per frame; at media scale the
    payload is the table, so that join is the whole cost. Exploding in
    the kernel instead means each payload crosses the Arrow boundary
    exactly once and fans out to its frames in memory, emitting only
    (media_id, frame_no, frame_ms, feature) rows. Same frame-index
    arithmetic as ``sample_frames`` (0, every_ms, ... < duration, ceil
    via (d-1)/e + 1), asserted equal in tests.

    The per-frame decode is the stub codec salted with the frame index
    (a real deployment seeks the container to frame_ms and decodes); the
    plumbing -- batch shape, fan-out, payload lifetime -- is real.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_no": [],
                "frame_ms": [],
                "feature": [],
            }
            for mid, kind, payload, meta in zip(
                b["media_id"], b["kind"], b["payload"], b["meta"]
            ):
                if kind != "video":
                    continue
                dur = meta["duration_ms"] or 0
                n_frames = max((int(dur) - 1) // every_ms, 0) + 1
                for f in range(n_frames):
                    # frame "seek" salt: a string suffix, so the stub
                    # digest is reproducible as sha256(text || '|' || f)
                    # in the SQL oracle (udf_surface.py framefeat branch)
                    frame_payload = (payload or b"") + f"|{f}".encode()
                    feat = decode_media(frame_payload, meta["codec"])[:dim]
                    out["media_id"].append(mid)
                    out["frame_no"].append(f)
                    out["frame_ms"].append(f * every_ms)
                    out["feature"].append(feat.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        "media_id bigint, frame_no int, frame_ms int, feature array<double>",
    )


def resize_meta(media: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Resize plumbing: recompute metadata declaratively (JVM-side) and
    mark payloads for re-encode. The byte transform itself is the stubbed
    codec step; the metadata math -- aspect-preserving clamp -- is real
    and runs in codegen, no Python."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(max_w) / w.cast("double"), F.lit(max_h) / h.cast("double"), F.lit(1.0)
    )
    return media.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.floor(w * scale).cast("int").alias("width"),
            F.floor(h * scale).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ).alias("meta"),
    )


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index (0, every_ms, 2*every_ms, ... < duration). The explode is pure
    JVM sequence arithmetic on metadata; per-frame decode would then be
    an ``extract_features``-shaped pass over (media_id, frame_idx)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("meta.duration_ms") - 1) / every_ms, F.lit(0)
                    ).cast("int"),
                )
            ).alias("frame_no"),
        )
        .select(
            "media_id",
            "frame_no",
            (F.col("frame_no") * every_ms).alias("frame_ms"),
        )
    )
