"""Native C++ runtime vs NumPy/JAX goldens."""

import numpy as np
import pytest

from adacom_tpu import native
from adacom_tpu.ops import bitpack


needs_native = pytest.mark.skipif(not native.available(), reason="no native lib")


@needs_native
@pytest.mark.parametrize("width", [1, 7, 16, 17, 31, 32])
def test_native_pack_matches_layout(width, rng):
    n = 10_000
    codes = (rng.integers(0, 1 << 32, n, dtype=np.uint64) &
             ((1 << width) - 1)).astype(np.uint32)
    got = native.pack_u32(codes, width)
    exp = bitpack.pack_numpy(codes, width)
    np.testing.assert_array_equal(got, exp)
    np.testing.assert_array_equal(native.unpack_u32(got, n, width), codes)


@needs_native
def test_native_gather(rng):
    n, width = 5000, 19
    codes = rng.integers(0, 1 << width, n, dtype=np.uint32)
    words = native.pack_u32(codes, width)
    L = bitpack.lanes_for(n)
    idx = rng.integers(0, n, 200)
    np.testing.assert_array_equal(
        native.gather_u32(words, L, width, idx), codes[idx]
    )


@needs_native
def test_native_filters(rng):
    vals = rng.integers(0, 100, 10_000).astype(np.uint32)
    v = 42
    np.testing.assert_array_equal(
        native.filter_eq_u32(vals, v), np.nonzero(vals == v)[0]
    )


@needs_native
def test_native_packed_filter_eq(rng):
    n, width = 20_000, 17
    base = 1_000_000
    vals = (base + rng.integers(0, 1 << width, n)).astype(np.uint64)
    codes = (vals - base).astype(np.uint32)
    words = native.pack_u32(codes, width)
    v = int(vals[1234])
    got = native.packed_filter_eq_u32(words, n, width, base, v)
    np.testing.assert_array_equal(got, np.nonzero(vals == v)[0])
    # miss below min_factor and above span
    assert len(native.packed_filter_eq_u32(words, n, width, base, 5)) == 0


@needs_native
def test_native_zipf():
    s = native.zipf_sample(10_000, 1.0, 7, 20_000)
    assert s.min() >= 1 and s.max() <= 10_000
    vals, counts = np.unique(s, return_counts=True)
    assert vals[np.argmax(counts)] <= 3
