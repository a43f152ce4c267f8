"""geoparquet_python_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``darcy-r/geoparquet-python`` (GeoParquet round-trip I/O + the dataframe
algebra that library exists to serve — see SURVEY.md), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Public API:

- :func:`geoparquet_python_spark.session.get_spark`
- :func:`geoparquet_python_spark.io.load_table` / ``load_tables``
- :func:`geoparquet_python_spark.sources.geoparquet.read_geoparquet`
- :func:`geoparquet_python_spark.sources.geoparquet.write_geoparquet`
- :mod:`geoparquet_python_spark.functions` — vector / text / geo scalar
  function library (pure ``pyspark.sql.functions`` compositions where
  possible; Arrow-vectorized pandas UDFs otherwise)
- :mod:`geoparquet_python_spark.operators` — query registry (each entry
  is exported through ``__spark_entry__.queries()``)
"""

from geoparquet_python_spark.registry import QUERIES, ORACLES, query

__all__ = ["QUERIES", "ORACLES", "query"]
