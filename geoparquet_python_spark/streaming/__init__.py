"""Structured Streaming operators (SURVEY.md §2.E)."""

import geoparquet_python_spark.streaming.anomaly  # noqa: F401
import geoparquet_python_spark.streaming.bloomgate  # noqa: F401
import geoparquet_python_spark.streaming.cmsgate  # noqa: F401
import geoparquet_python_spark.streaming.dprelease  # noqa: F401
import geoparquet_python_spark.streaming.dsirgate  # noqa: F401
import geoparquet_python_spark.streaming.learnedgate  # noqa: F401
import geoparquet_python_spark.streaming.neardup  # noqa: F401
import geoparquet_python_spark.streaming.serving  # noqa: F401
import geoparquet_python_spark.streaming.sessions  # noqa: F401
import geoparquet_python_spark.streaming.sessions_tws  # noqa: F401
import geoparquet_python_spark.streaming.spans  # noqa: F401
import geoparquet_python_spark.streaming.windows  # noqa: F401
