"""Device-side join and sort building blocks (single chip).

Reference capabilities: JoinHashTable::Build/Probe
(src/execution/operator/join/join_hashtable.cpp:197,415) and the radix
sort (src/common/sort/radix_sort.cpp:110) with key normalization to
byte-comparable form (src/common/sort/sort_state.cpp).

TPU-native redesign: the equi-join is SORT-BASED — a device argsort of
the build-side key hashes plus a vectorized binary search per probe key
(the same static-shape pattern the distributed layer uses,
parallel/ops.py make_distributed_join) — because a chained hash table
needs data-dependent pointer chasing the VPU can't do, while sort +
searchsorted is O(n log n) of pure vector work. Sorts use order-preserving
u64 key normalization and jnp.argsort/lexsort on device.

Inputs/outputs are host numpy (materialized batches live host-side); the
device does the O(n log n) work, the host does the final variable-length
pair expansion (np.repeat) which is linear and memory-bound. Gated by
row-count thresholds in DBConfig (device dispatch+transfer has a fixed
cost that only pays off for large inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=1)
def _join_fn():
    @jax.jit
    def f(lk, rk):
        order = jnp.argsort(rk, stable=True)
        rks = rk[order]
        lo = jnp.searchsorted(rks, lk, side="left")
        hi = jnp.searchsorted(rks, lk, side="right")
        return order, lo.astype(jnp.int64), hi.astype(jnp.int64)

    return f


def join_ranges(lk: np.ndarray, rk: np.ndarray):
    """Device sort+binary-search: for each left key, the [lo, hi) run of
    matching positions in the sorted right side, plus the sort order.

    Keys must be a consistent total order on both sides (any bijective
    transform of the equality classes works — callers pass 64-bit hashes
    viewed as int64)."""
    f = _join_fn()
    order, lo, hi = f(jnp.asarray(lk), jnp.asarray(rk))
    return np.asarray(order), np.asarray(lo), np.asarray(hi)


def join_pairs(lk: np.ndarray, rk: np.ndarray):
    """All matching (left_idx, right_idx) candidate pairs by key equality.

    Device does the sort + binary searches; host expands the variable-
    length runs. Callers must verify true key equality afterwards (hash
    collisions)."""
    order, lo, hi = join_ranges(lk, rk)
    counts = hi - lo
    total = int(counts.sum())
    li = np.repeat(np.arange(len(lk), dtype=np.int64), counts)
    if total == 0:
        return li, np.zeros(0, dtype=np.int64)
    starts = np.repeat(lo, counts)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(base, counts)
    ri = order[starts + within]
    return li, ri


@functools.lru_cache(maxsize=8)
def _argsort_fn(n_keys: int):
    @jax.jit
    def f(*keys):
        if len(keys) == 1:
            return jnp.argsort(keys[0], stable=True)
        return jnp.lexsort(keys)

    return f


def lexsort(keys_lsb_first) -> np.ndarray:
    """Device lexsort (last array = primary key, np.lexsort convention).

    Keys must be integer numpy arrays (order-normalized by the caller —
    executor._order_preserving_u64 handles sign/float mapping)."""
    f = _argsort_fn(len(keys_lsb_first))
    out = f(*(jnp.asarray(k) for k in keys_lsb_first))
    return np.asarray(out).astype(np.int64)
