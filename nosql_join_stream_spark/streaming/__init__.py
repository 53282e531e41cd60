"""Structured Streaming forms of the reference's unbounded semantics
(SURVEY.md §2.7): resumable event-log scans, windowed aggregation,
streaming dedup."""
