"""Shared state helpers: broadcast objects + lineage records."""
