"""Scalar / vector column-function library (SURVEY.md §2.8)."""
