"""Shared utilities: metrics writers, audio I/O, tree helpers."""
