"""Structured Streaming layer (SURVEY.md §1.5, §3.2-3.3)."""
