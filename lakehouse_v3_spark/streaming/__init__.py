"""Structured Streaming ingest patterns."""
