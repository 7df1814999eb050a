"""Pallas TPU kernel: fused bit-unpack + predicate + aggregate table scan.

The compressed-scan hot loop (reference SuccinctScanPartial,
succinct.cpp:124-144, plus the adjacent predicate and aggregate sink —
fused here) written as an explicit VMEM-tiled kernel. The vertical lane
layout of ops/bitpack.py makes every row's word index and bit offset
*static* (row r of a lane group lives at bits [r*w, r*w+w)), so the kernel
is 32 unrolled shift/mask/accumulate steps per lane tile — pure VPU work
streaming each packed word from HBM exactly once.

One `pallas_call` scans an entire stacked table: grid = (n_seg, n_tiles),
input (n_seg, width, n_lanes) uint32. Each program reduces its 32x256
element tile into per-lane uint32 accumulators (sum of low/high 16-bit
code halves, match count, code min/max) and writes one (8, 128) output
block; the 64-bit totals are assembled OUTSIDE the kernel by a jitted XLA
epilogue (sum = sum_codes + count * min_factor per segment).

x64-compat rules learned on real hardware (jax_enable_x64=True, which the
engine always sets): Mosaic cannot lower 64-bit converts (`jnp.sum` to a
scalar upcasts to int64 and dies), and `jnp.where(mask, x, 0)` with a weak
Python literal recurses forever in the convert lowering rule. Hence: no
in-kernel reductions to scalars, no untyped literals — only same-width
dtypes, `jnp.where` with explicitly-typed operands, and unrolled adds.

The predicate runs in *code space*: the caller translates a value-domain
range [lo, hi] to [lo - min_factor, hi - min_factor] with saturation, so
the kernel never needs the per-segment minimum.

Exactness is verified against the XLA decode path in tests/test_pallas.py
and on the real chip by tools/roofline.py. On non-TPU backends the kernel
runs in interpret mode (tests), with identical semantics.
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
CHUNK_SEGS = 512  # max segments per launch (bounds SMEM + compile variants)
_U32 = jnp.uint32
U32_MAX = 0xFFFFFFFF

# output row layout inside each program's (8, 128) block
ROW_SUM_LO, ROW_SUM_HI, ROW_CNT, ROW_MIN, ROW_MAX = 0, 1, 2, 3, 4


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(width: int, n_lanes: int = TILE_L) -> bool:
    """scan_table handles any lane count (tails are zero-padded)."""
    return 1 <= width <= 32 and n_lanes >= 1


@functools.lru_cache(maxsize=64)
def _build_table_scan(width: int, n_lanes: int, n_seg: int):
    """pallas_call over (n_seg, width, n_lanes) words + (n_seg, 8) scalars.

    scalars row: [count, lo_code, hi_code, 0...] all uint32.
    Returns raw (n_seg * n_tiles * 8, 128) uint32 partials."""
    if not supported(width, n_lanes):
        raise ValueError(f"unsupported width={width} n_lanes={n_lanes}")
    n_tiles = n_lanes // TILE_L
    mask_val = (1 << width) - 1 if width < 32 else U32_MAX

    def kernel(scal_ref, words_ref, out_ref):
        mask_c = _U32(mask_val)
        s = pl.program_id(0)
        i = pl.program_id(1)
        count = scal_ref[s, 0].astype(jnp.int32)
        lo = scal_ref[s, 1]
        hi = scal_ref[s, 2]
        # the segment's true lane count: tail segments are zero-padded up
        # to a TILE_L multiple, but the element order i = r*L + lane uses
        # the ORIGINAL L, so the flat index must too
        l_orig = scal_ref[s, 3].astype(jnp.int32)
        lane0 = i * TILE_L
        wm = words_ref[0]  # (width, TILE_L), read once from VMEM
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)
        lane_g = lane + lane0

        zero = jnp.zeros((1, TILE_L), _U32)
        one = jnp.full((1, TILE_L), 1, _U32)
        ffff = jnp.full((1, TILE_L), U32_MAX, _U32)
        s_lo = zero
        s_hi = zero
        cnt = zero
        mn = ffff
        mx = zero
        in_lane = lane_g < l_orig
        for r in range(bitpack.ROWS):
            p = r * width
            k, off = p >> 5, p & 31
            code = wm[k].reshape(1, TILE_L)
            if off:
                code = code >> _U32(off)
            if off + width > 32:
                code = code | (wm[k + 1].reshape(1, TILE_L) << _U32(32 - off))
            code = code & mask_c
            # element order: flat index = r * l_orig + global lane
            flat = lane_g + r * l_orig
            keep = in_lane & (flat < count) & (code >= lo) & (code <= hi)
            s_lo = s_lo + jnp.where(keep, code & _U32(0xFFFF), zero)
            s_hi = s_hi + jnp.where(keep, code >> _U32(16), zero)
            cnt = cnt + jnp.where(keep, one, zero)
            # Mosaic has no arith.minui/maxui: select on an unsigned cmp
            c_or_max = jnp.where(keep, code, ffff)
            c_or_min = jnp.where(keep, code, zero)
            mn = jnp.where(c_or_max < mn, c_or_max, mn)
            mx = jnp.where(c_or_min > mx, c_or_min, mx)

        def fold(x):  # (1, TILE_L) -> (1, 128) by pairwise lane add
            while x.shape[1] > 128:
                h = x.shape[1] // 2
                x = x[:, :h] + x[:, h:]
            return x

        def foldm(x, is_min):
            while x.shape[1] > 128:
                h = x.shape[1] // 2
                a, b_ = x[:, :h], x[:, h:]
                x = jnp.where(a < b_ if is_min else a > b_, a, b_)
            return x

        pad = jnp.zeros((3, 128), _U32)
        out_ref[...] = jnp.concatenate(
            [fold(s_lo), fold(s_hi), fold(cnt),
             foldm(mn, True), foldm(mx, False), pad],
            axis=0).reshape(1, 8, 128)

    # index maps must stay arithmetic-free and literal-free: under
    # jax_enable_x64, computed indices AND bare Python `0` literals trace
    # as i64, which Mosaic cannot lower (func.return (i32, i64) legalize
    # failure); np.int32 pins the dtype
    z = np.int32(0)
    call = pl.pallas_call(
        kernel,
        grid=(n_seg, n_tiles),
        in_specs=[
            # whole (n_seg, 8) scalar table in SMEM, indexed by program id
            # (a sub-array SMEM block trips the (8,128)-divisibility rule;
            # the map must return np.int32 — a default/blockless spec
            # synthesizes i64 zeros under x64, which Mosaic rejects)
            pl.BlockSpec((n_seg, 8), lambda s, i: (z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, width, TILE_L), lambda s, i: (s, z, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda s, i: (s, i, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_seg, n_tiles * 8, 128), _U32),
        interpret=_interpret(),
    )
    return call, n_tiles


@functools.lru_cache(maxsize=64)
def _build_runner(width: int, n_lanes: int, n_seg: int):
    call, n_tiles = _build_table_scan(width, n_lanes, n_seg)

    @jax.jit
    def run(words, scalars, mins):
        """-> padded int64 vector [sum, count, vmin, vmax, 0...].

        mins: (n_seg,) int64 frame-of-reference minima. vmin/vmax are in
        the VALUE domain and only meaningful when count > 0."""
        raw = call(scalars, words).reshape(n_seg, n_tiles, 8, 128)
        i64 = jnp.int64
        s_lo = raw[:, :, ROW_SUM_LO, :].astype(i64).sum(axis=(1, 2))
        s_hi = raw[:, :, ROW_SUM_HI, :].astype(i64).sum(axis=(1, 2))
        cnt = raw[:, :, ROW_CNT, :].astype(i64).sum(axis=(1, 2))
        mn_c = raw[:, :, ROW_MIN, :].min(axis=(1, 2)).astype(i64)
        mx_c = raw[:, :, ROW_MAX, :].max(axis=(1, 2)).astype(i64)
        seg_sum = s_lo + (s_hi << 16) + cnt * mins
        has = cnt > 0
        big = jnp.asarray(np.iinfo(np.int64).max, i64)
        gmin = jnp.min(jnp.where(has, mn_c + mins, big))
        gmax = jnp.max(jnp.where(has, mx_c + mins, -big - 1))
        out = jnp.zeros((16,), i64)
        out = out.at[0].set(seg_sum.sum())
        out = out.at[1].set(cnt.sum())
        out = out.at[2].set(gmin)
        out = out.at[3].set(gmax)
        return out

    return run


def scan_table(words: jax.Array, counts, mins, lo=None, hi=None, lanes=None,
               device_out: bool = False):
    """Fused compressed scan over a stacked table of same-width segments.

    words:  (n_seg, width, n_lanes) uint32 packed planes (bitpack layout);
            segments with fewer lanes are zero-padded on the lane axis
    counts: (n_seg,) valid row counts
    mins:   (n_seg,) per-segment frame-of-reference minima (python ints or
            numpy array)
    lo/hi:  inclusive predicate range in the VALUE domain (None = open)
    lanes:  (n_seg,) each segment's ORIGINAL lane count (defaults to the
            stacked lane dim) — element order is i = r*lanes[s] + lane

    Returns (sum, count, vmin, vmax) as python ints; vmin/vmax only valid
    when count > 0. Exact for 32-bit integer domains.
    """
    n_seg, width, n_lanes = (int(words.shape[0]), int(words.shape[1]),
                             int(words.shape[2]))
    mins64 = np.asarray(mins, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    lanes_arr = (np.full(n_seg, n_lanes, np.int64) if lanes is None
                 else np.asarray(lanes, dtype=np.int64))
    if n_lanes % TILE_L:
        pad = TILE_L - n_lanes % TILE_L
        words = jnp.pad(words, ((0, 0), (0, 0), (0, pad)))
        n_lanes += pad
    scal = np.zeros((n_seg, 8), dtype=np.uint32)
    scal[:, 0] = counts.astype(np.uint32)
    scal[:, 3] = lanes_arr.astype(np.uint32)
    # value-domain [lo, hi] -> code space with saturation; an empty range
    # (hi < mins) becomes hi_code < lo_code which matches nothing
    lo_v = -(1 << 62) if lo is None else int(lo)
    hi_v = (1 << 62) if hi is None else int(hi)
    lo_c = np.clip(lo_v - mins64, 0, U32_MAX)
    hi_c = np.clip(hi_v - mins64, -1, U32_MAX)
    scal[:, 1] = lo_c.astype(np.uint32)
    scal[:, 2] = np.where(hi_c < 0, 0, hi_c).astype(np.uint32)
    empty = hi_c < lo_c
    if empty.any():
        scal[empty, 1] = 1
        scal[empty, 2] = 0

    # launch in fixed-size segment chunks (tail padded to a power of two
    # with zero-count segments): segment counts vary per table/query, so
    # unchunked shapes would recompile per count and bloat SMEM
    dev_outs = []
    off = 0
    while off < n_seg:
        take = min(CHUNK_SEGS, n_seg - off)
        padded = 1 << (take - 1).bit_length()
        w_c = words[off:off + take]
        s_c = scal[off:off + take]
        m_c = mins64[off:off + take]
        if padded != take:
            w_c = jnp.pad(w_c, ((0, padded - take), (0, 0), (0, 0)))
            s_c = np.pad(s_c, ((0, padded - take), (0, 0)))
            m_c = np.pad(m_c, (0, padded - take))
        run = _build_runner(width, n_lanes, padded)
        dev_outs.append(run(w_c, jnp.asarray(s_c), jnp.asarray(m_c)))
        off += take
    if device_out:
        # leave results on device (callers time or fuse downstream; the
        # device link charges ~tens of ms per host pull here)
        return dev_outs
    if len(dev_outs) > 1:
        out = np.asarray(_merge_chunk_outs(*dev_outs))  # ONE pull
    else:
        out = np.asarray(dev_outs[0])
    return int(out[0]), int(out[1]), int(out[2]), int(out[3])


@jax.jit
def _merge_chunk_outs(*vecs):
    """Combine per-chunk [sum, count, min, max, ...] vectors on device so
    a multi-chunk table scan still costs exactly one host pull."""
    m = jnp.stack(vecs)
    out = jnp.zeros((16,), jnp.int64)
    out = out.at[0].set(m[:, 0].sum())
    out = out.at[1].set(m[:, 1].sum())
    out = out.at[2].set(m[:, 2].min())
    out = out.at[3].set(m[:, 3].max())
    return out


def scan_sum_count(words: jax.Array, min_factor: int, count: int,
                   lo: int, hi: int):
    """Single-segment fused scan: SUM(v), COUNT(*) over rows with
    lo <= v <= hi (value domain). Kept as the roofline/test entry point.

    words: (width, n_lanes) uint32 packed plane (ops/bitpack layout).
    Returns (sum int64, count int64) — exact for 32-bit domains."""
    s, c, _, _ = scan_table(words[None], [count], [int(min_factor)], lo, hi)
    return s, c
