"""Device join/sort building blocks vs numpy references.

These exercise ops/device_join.py directly (the executor gates them to
TPU backends + large inputs; the math is backend-agnostic so the CPU lane
validates semantics and the TPU lane validates hardware)."""

import numpy as np

import adacom_tpu  # noqa: F401 (jax config)
from adacom_tpu.ops import device_join


def _ref_pairs(lk, rk):
    order = np.argsort(rk, kind="stable")
    rks = rk[order]
    lo = np.searchsorted(rks, lk, "left")
    hi = np.searchsorted(rks, lk, "right")
    counts = hi - lo
    li = np.repeat(np.arange(len(lk)), counts)
    total = int(counts.sum())
    starts = np.repeat(lo, counts)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total) - np.repeat(base, counts)
    return li, order[starts + within]


def test_join_pairs_matches_reference(rng):
    lk = rng.integers(0, 500, 4000).astype(np.int64)
    rk = rng.integers(0, 500, 3000).astype(np.int64)
    li, ri = device_join.join_pairs(lk, rk)
    eli, eri = _ref_pairs(lk, rk)
    # pair sets must match (order within a key's run may differ)
    got = set(zip(li.tolist(), ri.tolist()))
    exp = set(zip(eli.tolist(), eri.tolist()))
    assert got == exp
    assert np.all(lk[li] == rk[ri])


def test_join_pairs_empty_and_disjoint(rng):
    lk = np.arange(100, dtype=np.int64)
    rk = np.arange(1000, 1100, dtype=np.int64)
    li, ri = device_join.join_pairs(lk, rk)
    assert len(li) == 0 and len(ri) == 0
    li, ri = device_join.join_pairs(lk, np.zeros(0, np.int64))
    assert len(li) == 0


def test_lexsort_matches_numpy(rng):
    a = rng.integers(0, 50, 5000).astype(np.int64)
    b = rng.integers(0, 50, 5000).astype(np.int64)
    idx = device_join.lexsort([a, b])  # b primary, a secondary (np order)
    exp = np.lexsort((a, b))
    # stable + same keys -> identical permutation
    np.testing.assert_array_equal(idx, exp)


def test_lexsort_single_key_stable(rng):
    a = rng.integers(0, 10, 3000).astype(np.int64)
    idx = device_join.lexsort([a])
    exp = np.argsort(a, kind="stable")
    np.testing.assert_array_equal(idx, exp)
