"""Device-side join and sort building blocks (single chip).

Reference capabilities: JoinHashTable::Build/Probe
(src/execution/operator/join/join_hashtable.cpp:197,415) and the radix
sort (src/common/sort/radix_sort.cpp:110) with key normalization to
byte-comparable form (src/common/sort/sort_state.cpp).

TPU-native redesign: device sorts use order-preserving u64 key
normalization and jnp.argsort/lexsort. A single-chip sort-based equi-join
(argsort + searchsorted) lived here rounds 2-4; it measured 8-14x slower
than the native chained hash table at every size from 100k to 4M rows on
the tunneled link (DEVICE_JOIN_CURVE.md), so the dead path was deleted —
multi-chip joins shuffle over the mesh (parallel/ops.py
make_distributed_join, which keeps the sort+searchsorted local probe).

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
