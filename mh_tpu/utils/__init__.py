"""Utilities: diagnostics, profiling, checkpointing, logging."""
