"""Scalar/aggregate function library (SURVEY.md §2.D, §2.F)."""
