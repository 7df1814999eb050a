"""Benchmark suite mirroring the reference's [succinct] micro group
(reference benchmark/micro/succinct/*, runner benchmark/benchmark_runner.cpp)."""
