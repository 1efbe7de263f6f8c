"""Custom operators: UDF tiers (SURVEY.md §2.10) and multimodal columns."""

from .multimodal import (  # noqa: F401
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    resize_meta,
    sample_frames,
    synth_media,
)
from .udfs import (  # noqa: F401
    band_builtin,
    band_of,
    band_pandas_udf,
    band_udf,
    doc_bands,
    doc_bands_mapinpandas,
)
