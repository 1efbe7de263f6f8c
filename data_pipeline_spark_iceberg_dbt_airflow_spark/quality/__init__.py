"""Data-quality checks (SURVEY.md §5, dbt-test stage D3)."""

from .report import corpus_report  # noqa: F401
from .learned import (  # noqa: F401
    DEFAULT_KEEP_THRESHOLD,
    learned_quality_scores,
)
from .checks import (  # noqa: F401
    CheckResult,
    accepted_values,
    expression,
    not_null,
    relationships,
    run_checks,
    unique,
)
