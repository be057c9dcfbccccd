"""Shared utilities: profiling, step timing, run logging."""
