import time
import numpy as np, jax, jax.numpy as jnp
import adacom_tpu
from adacom_tpu import types as tt
from adacom_tpu.ops import bitpack, pallas_scan, segcodec
print("backend:", jax.default_backend(), flush=True)

n = 1 << 24  # 16.7M values per segment-stack
rng = np.random.default_rng(0)
vals = (1000 + rng.integers(0, 1 << 20, n)).astype(np.uint32)
packed = segcodec.pack_segment(jnp.asarray(vals), tt.UINTEGER)
(w,) = packed.widths
print("width:", w, "n_lanes:", packed.n_lanes, "packed MB:", packed.nbytes/1e6)

lo, hi = 5000, 500_000
s, c = pallas_scan.scan_sum_count(packed.words[0], packed.min_factor, n, lo, hi)
m = (vals >= lo) & (vals <= hi)
assert int(c) == int(m.sum()), (int(c), m.sum())
assert int(s) == int(vals[m].astype(np.int64).sum())
print("exactness OK", flush=True)

# XLA reference path: decode_traced + where + sum
@jax.jit
def xla_scan(words, mn):
    v = segcodec.decode_traced((words,), mn, widths=(w,), compute_dtype=jnp.uint32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1), 0).squeeze(-1)
    keep = (idx < n) & (v >= lo) & (v <= hi)
    return jnp.sum(jnp.where(keep, v.astype(jnp.int64), 0)), jnp.sum(keep.astype(jnp.int64))

mn = jnp.asarray(packed.min_factor, dtype=jnp.uint32)
xs, xc = xla_scan(packed.words[0], mn)
assert int(xs) == int(s) and int(xc) == int(c)

def bench(f, *a, reps=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps

tp = bench(lambda: pallas_scan.scan_sum_count(packed.words[0], packed.min_factor, n, lo, hi))
tx = bench(lambda: xla_scan(packed.words[0], mn))
gb = packed.nbytes / 1e9
print(f"pallas: {tp*1e3:.3f} ms  {gb/tp:.1f} GB/s packed ({n/tp/1e9:.2f} Gvals/s)")
print(f"xla   : {tx*1e3:.3f} ms  {gb/tx:.1f} GB/s packed ({n/tx/1e9:.2f} Gvals/s)")
print("VERIFY OK")
