"""Custom sources (SURVEY.md §2.A extensibility escape hatch)."""

import geoparquet_python_spark.sources.synthetic  # noqa: F401
