"""Command-line entry points (train, synthesize, data tools)."""
