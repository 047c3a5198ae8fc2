"""Scalar/table function surface (SURVEY.md §2.9, §2.11)."""
