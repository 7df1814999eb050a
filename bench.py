#!/usr/bin/env python
"""Headline benchmark: SuccinctZipfDistribution (reference
benchmark/micro/succinct/zipf_distribution.cpp — 100M-row sequential
UINTEGER table, compacted to the succinct representation, 10k Zipf(k=1)
point lookups; methodology = 1 discarded cold run + 5 hot runs, mean).

Reference baseline: 17.49 s per hot run on the authors' server
(/root/reference/benchmarks.csv:32-36; BASELINE.md). Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"} where vs_baseline = ours/theirs
(< 1.0 is faster than the reference).

Scale with ADACOM_BENCH_SCALE (default 1.0 = the full 100M rows)."""

import json
import os
import sys
import time


def main():
    scale = float(os.environ.get("ADACOM_BENCH_SCALE", "1.0"))
    nruns = int(os.environ.get("ADACOM_BENCH_RUNS", "5"))
    t_start = time.time()

    from adacom_tpu.bench.runner import run_benchmark
    from adacom_tpu.bench.succinct_benchmarks import SuccinctZipfDistribution

    records = run_benchmark(SuccinctZipfDistribution, scale=scale, nruns=nruns)
    mean_s = sum(r["timing"] for r in records) / len(records)
    baseline_s = 17.49  # benchmarks.csv:32-36 mean, 5 hot runs
    size_packed = records[-1]["MemoryAllocationInBytes"]
    size_logical = records[-1]["sizeInBytes"]
    out = {
        "metric": "SuccinctZipfDistribution (10k Zipf point lookups, "
                  f"{int(100e6 * scale)} rows)",
        "value": round(mean_s, 4),
        "unit": "s",
        "vs_baseline": round(mean_s / baseline_s, 4),
        "detail": {
            "hot_runs_s": [round(r["timing"], 4) for r in records],
            "packed_bytes": size_packed,
            "data_bytes_before": size_logical,
            "scale": scale,
            "wall_total_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
