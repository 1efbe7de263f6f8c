"""Pipeline plans: dbt-style model transforms and the topological runner."""

from .models import fct_daily, stg_from_raw  # noqa: F401
from .runner import Model, PipelineRunner  # noqa: F401
