"""Metrics, profiling, checkpointing, configuration utilities."""
