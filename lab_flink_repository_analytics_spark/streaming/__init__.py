"""Structured Streaming layer (SURVEY.md §7 step 9)."""
