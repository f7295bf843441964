"""Structured Streaming operators (SURVEY.md §2b E6 streaming form)."""
