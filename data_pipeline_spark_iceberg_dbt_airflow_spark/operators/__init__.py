"""Custom operators: UDF tiers (SURVEY.md §2.10), multimodal columns,
graph (connected components), and skew salting."""

from .multimodal import (  # noqa: F401
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    extract_frame_features,
    resize_meta,
    sample_frames,
    synth_media,
)
from .bloom import (  # noqa: F401
    blocklist_screen,
    bloom_build,
    bloom_fp_rate,
    with_bloom_flag,
)
from .graph import MAX_CC_ITERATIONS, connected_components  # noqa: F401
from .layout import (  # noqa: F401
    bucketed_sorted_reader,
    compact_parquet,
    write_bucketed,
    write_zordered,
    zorder_key,
)
from .kmeans import (  # noqa: F401
    MAX_KMEANS_ITERATIONS,
    CorpusTooSmallError,
    assign_clusters,
    kmeans_cost,
    kmeans_fit,
)
from .pq import (  # noqa: F401
    ivfpq_topk,
    pq_decode,
    pq_encode,
    pq_fit,
    pq_topk,
)
from .pii import (  # noqa: F401
    PII_PATTERNS,
    pii_count,
    redact_pii,
    synth_pii,
)
from .metrics import ExecutionMetrics, measure  # noqa: F401
from .classifier import (  # noqa: F401
    SeedSetError,
    logreg_fit,
    logreg_score,
)
from .salted import salted_group_agg  # noqa: F401
from .sketches import (  # noqa: F401
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)
from .udfs import (  # noqa: F401
    asof_cogrouped,
    band_builtin,
    band_of,
    band_pandas_udf,
    band_udf,
    bands_ranked_applyinpandas,
    doc_bands,
    doc_bands_mapinpandas,
    make_chunk_udtf,
    mean_chars_grouped_agg,
)
