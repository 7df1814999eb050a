"""Pallas TPU kernel: fused bit-unpack + FOR-add + predicate + aggregate.

The compressed-scan hot loop (reference SuccinctScanPartial,
succinct.cpp:124-144, plus the adjacent predicate — fused here) written as
an explicit VMEM-tiled kernel. The vertical lane layout of ops/bitpack.py
makes every row's word index and bit offset *static* (row r of a lane group
lives at bit r*width), so the kernel is 32 unrolled shift/mask/add steps
per lane tile — pure VPU work streaming packed words from HBM once.

Grid: one program per lane tile (TILE_L = 256 lanes = 8192 elements);
groups of 8 programs share one (8, 128) output block (TPU sublane rule).
Each program emits three i32 partials into its output row: the tile's sum
of low 16-bit halves, sum of high halves, and match count (8192 * 0xFFFF
< 2^30, so i32 accumulators cannot overflow; the 64-bit total is assembled
outside the kernel as hi*65536 + lo). Predicate: lo <= v <= hi over the
decoded domain (equality = [v, v]; no filter = full domain).

Used by the scan-aggregate path when a segment's packed plane is tile
aligned; exactness is verified against the XLA decode path in
tests/test_pallas.py. On non-TPU backends the kernel runs in interpret
mode (tests), matching semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adacom_tpu.ops import bitpack

TILE_L = 256  # lanes per program: 32 rows x 256 lanes = 8192 elements
GROUP = 8     # programs sharing one (8, 128) output block (sublane rule)
_U32 = jnp.uint32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=64)
def _build(width: int, n_lanes: int):
    import sys

    if sys.getrecursionlimit() < 10000:
        sys.setrecursionlimit(10000)  # mosaic tracing of the unrolled decode
    if n_lanes % (TILE_L * GROUP) != 0:
        raise ValueError(f"n_lanes {n_lanes} not a multiple of {TILE_L * GROUP}")
    n_tiles = n_lanes // TILE_L
    mask = (1 << width) - 1 if width < 32 else 0xFFFFFFFF

    def kernel(scal_ref, words_ref, out_ref):
        t = pl.program_id(0) * GROUP + pl.program_id(1)
        j = pl.program_id(1)
        mn = scal_ref[0, 0]
        vlo = scal_ref[0, 1]
        vhi = scal_ref[0, 2]
        count = scal_ref[0, 3].astype(jnp.int32)
        lane0 = t * TILE_L
        wm = words_ref[...]  # (width, TILE_L) in VMEM, read once
        codes = []
        for r in range(bitpack.ROWS):
            p = r * width
            k, off = p >> 5, p & 31
            code = wm[k].reshape(1, TILE_L)
            if off:
                code = code >> _U32(off)
            if off + width > 32:
                code = code | (wm[k + 1].reshape(1, TILE_L)
                               << _U32(32 - off))
            codes.append(code & _U32(mask))
        v = jnp.concatenate(codes, axis=0) + mn  # (ROWS, TILE_L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bitpack.ROWS, TILE_L), 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (bitpack.ROWS, TILE_L), 0)
        flat = lane0 + lane + rowi * n_lanes  # element order: i = r*L + lane
        keep = (flat < count) & (v >= vlo) & (v <= vhi)
        sum_lo = jnp.sum(jnp.where(keep, (v & _U32(0xFFFF)).astype(jnp.int32), 0))
        sum_hi = jnp.sum(jnp.where(keep, (v >> _U32(16)).astype(jnp.int32), 0))
        cnt = jnp.sum(keep.astype(jnp.int32))
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = (jnp.where(slot == 0, sum_lo, 0)
               + jnp.where(slot == 1, sum_hi, 0)
               + jnp.where(slot == 2, cnt, 0))
        out_ref[pl.ds(j, 1), :] = row.astype(jnp.int32)

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles // GROUP, GROUP),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((width, TILE_L), lambda i, j: (0, i * GROUP + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 128), jnp.int32),
        interpret=_interpret(),
    )

    @jax.jit
    def run(words, scalars):
        partials = call(scalars, words)
        s = (partials[:, 1].astype(jnp.int64).sum() * 65536
             + partials[:, 0].astype(jnp.int64).sum())
        c = partials[:, 2].astype(jnp.int64).sum()
        return s, c

    return run


def supported(width: int, n_lanes: int) -> bool:
    return 1 <= width <= 32 and n_lanes % (TILE_L * GROUP) == 0


def scan_sum_count(words: jax.Array, min_factor: int, count: int,
                   lo: int, hi: int):
    """Fused compressed scan: SUM(v), COUNT(*) over rows with lo<=v<=hi.

    words: (width, n_lanes) uint32 packed plane (ops/bitpack layout).
    Returns (sum int64, count int64) — exact for u32 domains."""
    width, n_lanes = int(words.shape[0]), int(words.shape[1])
    run = _build(width, n_lanes)
    scalars = jnp.asarray(
        [[np.uint32(min_factor), np.uint32(lo), np.uint32(hi),
          np.uint32(count)]], dtype=_U32)
    return run(words, scalars)
