"""Offline depth-prior pipeline (SURVEY.md L7): COLMAP driver, dense-depth
extraction, MVS camera export, segment-wise RANSAC depth alignment, and
geometric-consistency depth fusion."""
