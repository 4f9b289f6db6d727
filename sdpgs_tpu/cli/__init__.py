"""Command-line entry points (train / render / metrics)."""
