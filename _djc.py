#!/usr/bin/env python
"""Host vs device equi-join crossover on the real chip (VERDICT r4 #6:
prove the device join or delete it). Times the native chained hash table
(native/adacom_native.cpp JoinTable, the reference join_hashtable.cpp
analogue) against the device sort+searchsorted join
(ops/device_join.join_pairs) including host<->device transfer, at
increasing build/probe sizes. Writes DEVICE_JOIN_CURVE.md."""
import sys
import time

import numpy as np


def main():
    import jax

    from adacom_tpu import native
    from adacom_tpu.ops import device_join

    assert native.available(), "native library required"
    print("backend:", jax.default_backend(), file=sys.stderr)
    rng = np.random.default_rng(13)
    rows = ["# Device vs host equi-join crossover (real chip, tunneled link)",
            "",
            f"backend: {jax.default_backend()}; keys int64, probe = 2x build,",
            "~50% match rate; host = native chained hash table (build+probe),",
            "device = argsort + searchsorted (jit, includes transfers);",
            "best of 3 hot runs after one warmup.",
            "",
            "| build rows | probe rows | host (s) | device (s) | device/host |",
            "|---|---|---|---|---|"]
    for nb in (100_000, 1_000_000, 4_000_000, 16_000_000, 40_000_000):
        np_ = nb * 2
        bk = rng.integers(0, nb * 2, nb)
        pk = rng.integers(0, nb * 2, np_)

        def host_run():
            ht = native.JoinTable(bk)
            li, ri = ht.probe(pk)
            ht.close()
            return len(li)

        def dev_run():
            li, ri = device_join.join_pairs(pk, bk)
            return len(li)

        host_run(); dev_run()  # warm (compile + link)
        th = min(_t(host_run) for _ in range(3))
        td = min(_t(dev_run) for _ in range(3))
        rows.append(f"| {nb:,} | {np_:,} | {th:.3f} | {td:.3f} "
                    f"| {td / th:.2f}x |")
        print(rows[-1], file=sys.stderr, flush=True)
    with open("DEVICE_JOIN_CURVE.md", "w") as f:
        f.write("\n".join(rows) + "\n")
    print("wrote DEVICE_JOIN_CURVE.md")


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
