"""Sinks (SURVEY.md §2.B)."""
