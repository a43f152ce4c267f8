"""Operator/query modules. Importing this package registers every
query in the central registry (geoparquet_python_spark.registry)."""

import geoparquet_python_spark.operators.aggregation  # noqa: F401
import geoparquet_python_spark.operators.analytics  # noqa: F401
import geoparquet_python_spark.operators.asof  # noqa: F401
import geoparquet_python_spark.operators.contamination  # noqa: F401
import geoparquet_python_spark.operators.crosscorpus  # noqa: F401
import geoparquet_python_spark.operators.cdc  # noqa: F401
import geoparquet_python_spark.operators.custom_source  # noqa: F401
import geoparquet_python_spark.operators.dataquality  # noqa: F401
import geoparquet_python_spark.operators.dedup  # noqa: F401
import geoparquet_python_spark.operators.geoio  # noqa: F401
import geoparquet_python_spark.operators.graph  # noqa: F401
import geoparquet_python_spark.operators.geospatial  # noqa: F401
import geoparquet_python_spark.operators.jsonio  # noqa: F401
import geoparquet_python_spark.operators.kmeans  # noqa: F401
import geoparquet_python_spark.operators.mmr  # noqa: F401
import geoparquet_python_spark.operators.multimodal  # noqa: F401
import geoparquet_python_spark.operators.packing  # noqa: F401
import geoparquet_python_spark.operators.passages  # noqa: F401
import geoparquet_python_spark.operators.pipeline  # noqa: F401
import geoparquet_python_spark.operators.pq  # noqa: F401
import geoparquet_python_spark.operators.quality  # noqa: F401
import geoparquet_python_spark.operators.relational  # noqa: F401
import geoparquet_python_spark.operators.retrieval  # noqa: F401
import geoparquet_python_spark.operators.sampling  # noqa: F401
import geoparquet_python_spark.operators.scalars  # noqa: F401
import geoparquet_python_spark.operators.semdedup  # noqa: F401
import geoparquet_python_spark.operators.similarity  # noqa: F401
import geoparquet_python_spark.operators.sketches  # noqa: F401
import geoparquet_python_spark.operators.skew  # noqa: F401
import geoparquet_python_spark.operators.splits  # noqa: F401
import geoparquet_python_spark.operators.textanalysis  # noqa: F401
import geoparquet_python_spark.operators.timeseries  # noqa: F401
import geoparquet_python_spark.operators.tpch_more  # noqa: F401
import geoparquet_python_spark.operators.udtf_ops  # noqa: F401
import geoparquet_python_spark.operators.windows  # noqa: F401
