"""Structured Streaming layer: batch/stream duality for the pipelines.

Every pipeline in :mod:`..plans` is a pure DataFrame transform; this package
re-runs them as Structured Streaming jobs (``trigger(availableNow=True)``)
and adds the keyed-state operators that need true streaming semantics
(SURVEY.md §2.6 D1-D5, §2.10 W1-W12).
"""
