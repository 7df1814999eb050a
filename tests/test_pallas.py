"""Pallas fused scan kernel vs the XLA decode path (exactness golden)."""

import jax.numpy as jnp
import numpy as np
import pytest

import adacom_tpu  # noqa: F401  (jax config)
from adacom_tpu import types as tt
from adacom_tpu.ops import bitpack, pallas_scan, segcodec


@pytest.mark.parametrize("width_span", [1, 250, 4000, (1 << 20) - 1])
def test_scan_sum_count_matches_numpy(width_span):
    n = 65536  # n_lanes = 2048, multiple of TILE_L
    rng = np.random.default_rng(width_span)
    vals = (77 + rng.integers(0, width_span + 1, n)).astype(np.uint32)
    packed = segcodec.pack_segment(jnp.asarray(vals), tt.UINTEGER)
    (w,) = packed.widths
    if w == 0:
        pytest.skip("constant plane")
    assert pallas_scan.supported(w, packed.n_lanes)
    lo, hi = 100, 77 + width_span // 2
    s, c = pallas_scan.scan_sum_count(packed.words[0], packed.min_factor,
                                      n, lo, hi)
    m = (vals >= lo) & (vals <= hi)
    assert int(c) == int(m.sum())
    assert int(s) == int(vals[m].astype(np.int64).sum())


def test_scan_tail_masking():
    n = 65536 - 13  # count below padded size: tail rows must not leak
    vals = np.full(n, 5, dtype=np.uint32)
    packed = segcodec.pack_segment(jnp.asarray(vals), tt.UINTEGER,
                                   vmin=0, vmax=8)
    (w,) = packed.widths
    if packed.n_lanes % pallas_scan.TILE_L:
        pytest.skip("unaligned lanes")
    s, c = pallas_scan.scan_sum_count(packed.words[0], packed.min_factor,
                                      n, 0, 10)
    assert int(c) == n and int(s) == 5 * n


def test_scan_equality_probe():
    n = 131072
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1000, n).astype(np.uint32)
    packed = segcodec.pack_segment(jnp.asarray(vals), tt.UINTEGER)
    (w,) = packed.widths
    s, c = pallas_scan.scan_sum_count(packed.words[0], packed.min_factor,
                                      n, 123, 123)
    m = vals == 123
    assert int(c) == int(m.sum()) and int(s) == 123 * int(m.sum())
