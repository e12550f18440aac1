"""Structured Streaming extensions (incremental encode)."""
