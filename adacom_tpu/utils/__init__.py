"""Utilities: device warmup, profiling, workload generators."""
