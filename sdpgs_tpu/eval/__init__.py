"""Evaluation: metrics harness + render CLI."""
