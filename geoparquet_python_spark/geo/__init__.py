"""Geometry layer: WKB codec, ST_* functions, GeoParquet I/O.

The reference's entire library is this layer (geoparquet/__init__.py≈,
SURVEY.md §0.2); everything else in this engine is the capability
closure around it.
"""
