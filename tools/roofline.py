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

    # The tunneled device link imposes a fixed ~25-45 ms latency on every
    # SYNCHRONIZED dispatch, independent of data size, hiding any kernel
    # under it. Kernel time is therefore measured amortized: K iterations
    # chained inside ONE jit (each iteration's scalar inputs depend on the
    # previous result, so XLA cannot hoist or CSE the kernel), one pull —
    # AND the fixed sync latency is measured separately at K=1 and
    # SUBTRACTED (round 4 divided the un-subtracted wall by K=20, so the
    # ~30 ms link sync masqueraded as ~1.5 ms of kernel time and the
    # report showed 5-14%% of roofline for kernels actually at 50-130%%).
    K = max(100, args.runs)

    # ---- fused Pallas kernel ----
    s_, c_, _, _ = pallas_scan.scan_table(words, counts, mins, lo, hi,
                                          minmax=False)
    assert (s_, c_) == expect, ((s_, c_), expect)

    n_lanes = int(words.shape[2])
    lane8 = n_lanes // 8
    n_pad = 1 << (n_seg - 1).bit_length()
    blk = pallas_scan._seg_blk_for(args.width, lane8, n_pad)
    run = pallas_scan._build_runner(args.width, lane8, n_pad, blk,
                                    True, False)
    mins64 = np.asarray(mins, np.int64)
    scal = np.zeros((n_seg, 8), dtype=np.uint32)
    scal[:, 0] = np.asarray(counts, np.uint32)
    scal[:, 3] = n_lanes
    scal[:, 1] = np.clip(lo - mins64, 0, 0xFFFFFFFF).astype(np.uint32)
    scal[:, 2] = np.clip(hi - mins64, 0, 0xFFFFFFFF).astype(np.uint32)
    w_c = words.reshape(n_seg, args.width, 8, lane8)
    if n_pad != n_seg:
        w_c = jnp.pad(w_c, ((0, n_pad - n_seg), (0, 0), (0, 0), (0, 0)))
        scal = np.pad(scal, ((0, n_pad - n_seg), (0, 0)))
        mins64 = np.pad(mins64, (0, n_pad - n_seg))
    scal_d = jnp.asarray(scal)
    mins_d = jnp.asarray(mins64)

    import jax.numpy as jnp2

    def chained(runner):
        @jax.jit
        def f(wds, scal0, mn):
            def body(i, acc):
                # data-dependent scalar tweak in an UNUSED slot serializes
                # the iterations without changing semantics
                s2 = scal0.at[0, 5].set(acc[1].astype(jnp2.uint32))
                return runner(wds, s2, mn)
            return jax.lax.fori_loop(0, K, body,
                                     jnp2.zeros((16,), jnp2.int64))
        return f

    def chained1(runner):
        @jax.jit
        def f(wds, scal0, mn):
            return runner(wds, scal0, mn)
        return f

    def amortized(chain_k, chain_1, *args_):
        def t(fn):
            t0 = time.perf_counter()
            np.asarray(fn(*args_))
            return time.perf_counter() - t0
        t1 = min(t(chain_1) for _ in range(3))
        tk = min(t(chain_k) for _ in range(2))
        return max((tk - t1) / (K - 1), 1e-9)

    chain_p = chained(run)
    chain_p1 = chained1(run)
    out = np.asarray(chain_p(w_c, scal_d, mins_d))
    assert (int(out[0]), int(out[1])) == expect, (out, expect)
    dt_p = amortized(chain_p, chain_p1, w_c, scal_d, mins_d)
    gbps_p = packed_bytes / dt_p / 1e9
    print(f"pallas fused scan (kernel): {dt_p * 1e3:8.3f} ms  "
          f"{gbps_p:7.1f} GB/s  {rows / dt_p / 1e9:6.2f} Grows/s"
          + (f"  ({100 * gbps_p / peak:.0f}% of roofline)" if peak else ""))

    # ---- lean variant (no predicate): SELECT sum(x), count(*) ----
    run_lean = pallas_scan._build_runner(args.width, lane8, n_pad, blk,
                                         False, False)
    scal_l = scal.copy()
    scal_l[:, 1] = 0
    scal_l[:, 2] = 0xFFFFFFFF
    scal_ld = jnp.asarray(scal_l)
    chain_l = chained(run_lean)
    chain_l1 = chained1(run_lean)
    out = np.asarray(chain_l(w_c, scal_ld, mins_d))
    exp_all = (int(a.sum()), rows)
    assert (int(out[0]), int(out[1])) == exp_all, (out, exp_all)
    dt_l = amortized(chain_l, chain_l1, w_c, scal_ld, mins_d)
    gbps_l = packed_bytes / dt_l / 1e9
    print(f"pallas lean sum (kernel):   {dt_l * 1e3:8.3f} ms  "
          f"{gbps_l:7.1f} GB/s  {rows / dt_l / 1e9:6.2f} Grows/s"
          + (f"  ({100 * gbps_l / peak:.0f}% of roofline)" if peak else ""))
    t0 = time.perf_counter()
    pallas_scan.scan_table(words, counts, mins, lo, hi, minmax=False)
    dt_pe = time.perf_counter() - t0
    print(f"pallas fused scan (e2e):    {dt_pe * 1e3:8.3f} ms  "
          f"(fixed device-link sync latency {1e3 * (dt_pe - dt_p):.1f} ms)")

    # ---- XLA fused decode+filter+agg (the engine's generic path) ----
    w = args.width

    def xla_scan_once(wds, mins_arr, lo_a, hi_a):
        def seg(wd, mf):
            codes = bitpack.unpack(wd, width=w).reshape(-1)
            v = codes + mf
            keep = (v >= lo_a) & (v <= hi_a)
            s = jnp.sum(jnp.where(keep, v.astype(jnp.int64),
                                  jnp.zeros((), jnp.int64)))
            c = jnp.sum(keep.astype(jnp.int64))
            return s, c
        ss, cs = jax.vmap(seg)(wds, mins_arr)
        return ss.sum(), cs.sum()

    @jax.jit
    def xla_scan(wds, mins_arr):
        return xla_scan_once(wds, mins_arr, np.uint32(lo), np.uint32(hi))

    mins_arr = jnp.asarray(np.asarray(mins, np.uint32))
    s2, c2 = (int(x) for x in xla_scan(words, mins_arr))
    assert (s2, c2) == expect, ((s2, c2), expect)

    @jax.jit
    def chain_x(wds, mins_arr):
        def body(i, acc):
            # serialize via a data-dependent +0 on the (tiny) mins array
            zero_dep = (acc[1] % 1).astype(jnp.uint32)
            s, c = xla_scan_once(wds, mins_arr + zero_dep,
                                 np.uint32(lo), np.uint32(hi))
            return jnp.stack([s, c])
        return jax.lax.fori_loop(0, K, body, jnp.zeros((2,), jnp.int64))

    out = np.asarray(chain_x(words, mins_arr))
    assert (int(out[0]), int(out[1])) == expect
    dt_x = amortized(chain_x, xla_scan, words, mins_arr)
    gbps_x = packed_bytes / dt_x / 1e9
    print(f"XLA fused scan (kernel):    {dt_x * 1e3:8.3f} ms  "
          f"{gbps_x:7.1f} GB/s  {rows / dt_x / 1e9:6.2f} Grows/s"
          + (f"  ({100 * gbps_x / peak:.0f}% of roofline)" if peak else ""))
    print(f"pallas/XLA kernel speedup: {dt_x / dt_p:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
