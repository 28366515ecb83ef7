"""Scalar/expression function library.

The reference's scalar surface is its type-coercion matrix plus a few
bit/string helpers (SURVEY.md §2.7). This package adds the functions
the training-data-pipeline operators need. Where an operator must be
checkable against the DuckDB oracle, each function has a Spark Column
builder AND a DuckDB SQL-snippet builder, kept adjacent so the two
dialects can't drift.
"""
