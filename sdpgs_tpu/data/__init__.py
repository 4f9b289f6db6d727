"""Data layer: COLMAP parsers, PLY I/O, dataset readers, scene orchestration."""
