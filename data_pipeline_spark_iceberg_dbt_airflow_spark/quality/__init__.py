"""Data-quality checks (SURVEY.md §5, dbt-test stage D3)."""

from .report import corpus_report  # noqa: F401
from .checks import (  # noqa: F401
    CheckResult,
    accepted_values,
    expression,
    not_null,
    relationships,
    run_checks,
    unique,
)
