"""Structured Streaming extensions (SURVEY.md §2.10 — beyond reference
surface, flagged as extensions: the reference is batch-only)."""
