#!/usr/bin/env python
"""Decode-scan roofline on the real chip.

Measures the fused compressed-scan throughput (ops/pallas_scan.scan_table:
bit-unpack + predicate + aggregate in one kernel) and the XLA fused decode
path against the HBM roofline, and verifies both bit-exact against NumPy.

The scan streams `width/32 * 4` bytes per row; at the HBM roofline the
width-16 scan therefore processes rows at 2 bytes/row * bandwidth. The
reference's equivalent loop is SuccinctScanPartial (succinct.cpp:124-144)
plus the adjacent predicate — serial sdsl bit-cursor decode on a CPU.

Usage: python tools/roofline.py [--rows 64e6] [--width 16] [--runs 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

HBM_GBPS = {  # peak HBM bandwidth per chip, public specs
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=64e6)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--runs", type=int, default=20)
    args = ap.parse_args()

    from adacom_tpu import types as tt  # jax config (x64 on, like the engine)
    import jax
    import jax.numpy as jnp
    from adacom_tpu.ops import bitpack, pallas_scan, segcodec
    from adacom_tpu.utils.warmup import ensure_transfer_warm

    ensure_transfer_warm()  # first device->host pull costs minutes here
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    peak = next((v for k, v in HBM_GBPS.items() if k.lower() in kind.lower()),
                None)
    print(f"device: {kind}  backend: {jax.default_backend()}  "
          f"peak HBM: {peak or 'unknown'} GB/s")

    seg_rows = 1 << 16
    n_seg = max(1, int(args.rows) // seg_rows)
    rows = n_seg * seg_rows
    rng = np.random.default_rng(0)
    span = (1 << args.width) - 1
    base = 1_000_000

    words_l, counts, mins, host = [], [], [], []
    for s in range(n_seg):
        vals = (base + rng.integers(0, span + 1, seg_rows)).astype(np.uint32)
        host.append(vals)
        p = segcodec.pack_segment(jnp.asarray(vals), tt.UINTEGER,
                                  vmin=base, vmax=base + span)
        assert p.widths == (args.width,), p.widths
        words_l.append(p.words[0])
        counts.append(p.count)
        mins.append(p.min_factor)
    words = jnp.stack(words_l)
    words.block_until_ready()
    packed_bytes = words.size * 4
    print(f"rows: {rows:,}  segments: {n_seg}  width: {args.width} bits  "
          f"packed: {packed_bytes / 1e6:.1f} MB "
          f"({packed_bytes / rows:.2f} B/row vs 4.00 plain)")

    lo, hi = base + span // 4, base + (3 * span) // 4
    a = np.concatenate(host).astype(np.int64)
    m = (a >= lo) & (a <= hi)
    expect = (int(a[m].sum()), int(m.sum()))

    # ---- fused Pallas kernel ----
    s_, c_, _, _ = pallas_scan.scan_table(words, counts, mins, lo, hi)
    assert (s_, c_) == expect, ((s_, c_), expect)
    # kernel-only: results stay on device (the tunneled device link costs
    # ~tens of ms per host pull — reported separately as e2e)
    t0 = time.perf_counter()
    for _ in range(args.runs):
        jax.block_until_ready(pallas_scan.scan_table(
            words, counts, mins, lo, hi, device_out=True))
    dt_p = (time.perf_counter() - t0) / args.runs
    gbps_p = packed_bytes / dt_p / 1e9
    print(f"pallas fused scan (kernel): {dt_p * 1e3:8.3f} ms  "
          f"{gbps_p:7.1f} GB/s  {rows / dt_p / 1e9:6.2f} Grows/s"
          + (f"  ({100 * gbps_p / peak:.0f}% of roofline)" if peak else ""))
    t0 = time.perf_counter()
    for _ in range(args.runs):
        pallas_scan.scan_table(words, counts, mins, lo, hi)
    dt_pe = (time.perf_counter() - t0) / args.runs
    print(f"pallas fused scan (+pull):  {dt_pe * 1e3:8.3f} ms  "
          f"(host-pull overhead {1e3 * (dt_pe - dt_p):.1f} ms)")

    # ---- XLA fused decode+filter+agg (the engine's generic path) ----
    w = args.width

    @jax.jit
    def xla_scan(words, mins_arr):
        def seg(wds, mf):
            codes = bitpack.unpack(wds, width=w).reshape(-1)
            v = codes + mf
            keep = (v >= np.uint32(lo)) & (v <= np.uint32(hi))
            s = jnp.sum(jnp.where(keep, v.astype(jnp.int64),
                                  jnp.zeros((), jnp.int64)))
            c = jnp.sum(keep.astype(jnp.int64))
            return s, c
        ss, cs = jax.vmap(seg)(words, mins_arr)
        return ss.sum(), cs.sum()

    mins_arr = jnp.asarray(np.asarray(mins, np.uint32))
    s2, c2 = (int(x) for x in xla_scan(words, mins_arr))
    assert (s2, c2) == expect, ((s2, c2), expect)
    t0 = time.perf_counter()
    for _ in range(args.runs):
        jax.block_until_ready(xla_scan(words, mins_arr))
    dt_x = (time.perf_counter() - t0) / args.runs
    gbps_x = packed_bytes / dt_x / 1e9
    print(f"XLA fused scan (kernel):    {dt_x * 1e3:8.3f} ms  "
          f"{gbps_x:7.1f} GB/s  {rows / dt_x / 1e9:6.2f} Grows/s"
          + (f"  ({100 * gbps_x / peak:.0f}% of roofline)" if peak else ""))
    print(f"pallas/XLA kernel speedup: {dt_x / dt_p:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
