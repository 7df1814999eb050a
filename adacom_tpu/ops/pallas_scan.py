"""Pallas TPU kernel: fused bit-unpack + predicate + aggregate table scan.

The compressed-scan hot loop (reference SuccinctScanPartial,
succinct.cpp:124-144, plus the adjacent predicate and aggregate sink —
fused here) written as an explicit VMEM-tiled kernel. The vertical lane
layout of ops/bitpack.py makes every row's word index and bit offset
*static* (row r of a lane group lives at bits [r*w, r*w+w)), so the kernel
is 32 unrolled shift/mask/accumulate steps — pure VPU work streaming each
packed word from HBM exactly once.

Throughput design (v2 — the v1 kernel ran at 3.7 GB/s on a 819 GB/s chip):
- the packed lane axis is viewed as (8, L/8) so every vector op fills all
  8 VPU sublanes (v1 used (1, 256) slices at 1/8 utilization);
- each grid step processes a block of SEG_BLK whole segments (~2 MB of
  packed words per DMA) instead of one 16 KB tile, so grid/DMA-latency
  overhead amortizes away;
- predicate comparisons and min/max tracking compile out entirely when the
  caller doesn't need them (`SELECT count(*), sum(x)` runs the lean
  variant).

One `pallas_call` scans an entire stacked table: grid = (n_chunks,), input
(n_seg, width, 8, L/8) uint32. Each program reduces its segments into
per-segment (8, 128) uint32 partial rows (sum of low/high 16-bit code
halves, match count, [code min, code max]); the 64-bit totals are
assembled OUTSIDE the kernel by a jitted XLA epilogue
(sum = sum_codes + count * min_factor per segment).

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

# lane-padding quantum: lanes reshape to (8, L/8) whose minor dim must be
# a multiple of the 128-lane vreg width -> L must be a multiple of 1024
TILE_L = 1024
CHUNK_SEGS = 4096  # max segments per launch (bounds the SMEM scalar table)
BLK_BYTES = 2 << 20  # target packed bytes per grid step
_U32 = jnp.uint32
_I32 = jnp.int32
U32_MAX = 0xFFFFFFFF

# output row layout inside each segment's (n_out, 8, 128) block
ROW_SUM_LO, ROW_SUM_HI, ROW_CNT, ROW_MIN, ROW_MAX = 0, 1, 2, 3, 4


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(width: int, n_lanes: int = TILE_L) -> bool:
    """scan_table handles any lane count (tails are zero-padded)."""
    return 1 <= width <= 32 and n_lanes >= 1


@functools.lru_cache(maxsize=128)
def _build_table_scan(width: int, lane8: int, n_seg: int, seg_blk: int,
                      pred: bool, minmax: bool, has_valid: bool = False):
    """pallas_call over (n_seg, width, 8, lane8) words + (n_seg, 8) scalars.

    scalars row: [count, lo_code, hi_code, l_orig, 0...] all uint32 —
    an empty predicate range is encoded by the CALLER as count = 0.
    Returns raw (n_seg, n_out, 8, 128) uint32 partials; row layout depends
    on the variant (see _row_layout)."""
    if not supported(width, lane8 * 8):
        raise ValueError(f"unsupported width={width}")
    if n_seg % seg_blk:
        raise ValueError("n_seg must be a multiple of seg_blk")
    mask_val = (1 << width) - 1 if width < 32 else U32_MAX
    fold_f = max(1, lane8 // 128)
    # single-accumulator mode: 32 codes + lane folding stay below 2^32
    narrow = bitpack.ROWS * mask_val * fold_f < (1 << 32)
    if not narrow and bitpack.ROWS * 0xFFFF * fold_f >= (1 << 32):
        raise ValueError(f"segment too wide for u32 partials: lane8={lane8}")
    rows_l, n_out = _row_layout(pred or has_valid, minmax, narrow)
    need_cnt = pred or minmax or has_valid
    # lean sum-only variant: padded lanes hold ZERO words, so out-of-range
    # rows decode to code 0 and add nothing — no mask, no selects, just
    # shift/or/and/add (~3 VPU ops per row instead of ~8); the true count
    # comes from the scalar table in the epilogue. NULL slots hold FILL
    # values (segment.py), so a validity plane forces the masked path for
    # sums/counts (min/max stay correct either way: fills duplicate a
    # valid value).
    lean = not pred and not minmax and not has_valid

    def kernel(scal_ref, words_ref, *refs):
        # refs = (valid_ref, out_ref) with a validity plane, else (out_ref,)
        if has_valid:
            valid_ref, out_ref = refs
        else:
            (out_ref,) = refs
        # v3: vectorized ACROSS the segment block — one instruction
        # stream over (seg_blk, 8, lane8) arrays instead of seg_blk
        # unrolled copies (v2 was instruction-bound at 45 GB/s; longer
        # vectors let the VPU pipeline the 32-row dependency chain).
        # Per-segment scalars ride a VMEM block and broadcast as
        # (seg_blk, 1, 1) vectors.
        mask_c = _U32(mask_val)
        count = scal_ref[:, 0:1].astype(_I32)[:, :, None]   # (B,1,1)
        l_orig = scal_ref[:, 3:4].astype(_I32)[:, :, None]
        if pred:
            lo = scal_ref[:, 1:2][:, :, None]
            # unsigned-range trick: code in [lo, hi] iff
            # (code - lo) <= (hi - lo) in uint32 arithmetic
            span_c = scal_ref[:, 2:3][:, :, None] - lo
        wm = words_ref[...]  # (B, width, 8, lane8)
        if has_valid:
            vw0 = valid_ref[...][:, 0]  # (B, 8, lane8) width-1 plane
        ia = jax.lax.broadcasted_iota(_I32, (8, lane8), 0)
        ib = jax.lax.broadcasted_iota(_I32, (8, lane8), 1)
        lane_g = (ia * np.int32(lane8) + ib)[None]          # (1,8,lane8)

        zero = jnp.zeros((seg_blk, 8, lane8), _U32)
        one = jnp.full((seg_blk, 8, lane8), 1, _U32)
        acc = zero
        if not narrow:
            acc_hi = zero
        if need_cnt:
            cnt = zero
        if minmax:
            ffff = jnp.full((seg_blk, 8, lane8), U32_MAX, _U32)
            mn = ffff
            mx = zero
        for r in range(bitpack.ROWS):
            p = r * width
            k, off = p >> 5, p & 31
            code = wm[:, k]                                  # (B,8,lane8)
            if off:
                code = code >> _U32(off)
            if off + width > 32:
                code = code | (wm[:, k + 1] << _U32(32 - off))
            code = code & mask_c
            if lean:
                if narrow:
                    acc = acc + code
                else:
                    acc = acc + (code & _U32(0xFFFF))
                    acc_hi = acc_hi + (code >> _U32(16))
                continue
            # valid iff global lane < l_orig AND flat index
            # (= r*l_orig + lane) < count, folded into one threshold
            thr = jnp.minimum(count - np.int32(r) * l_orig, l_orig)
            keep = lane_g < thr
            if has_valid:
                # vertical width-1 layout: row r of a lane is bit r
                keep = keep & (((vw0 >> _U32(r)) & _U32(1)) != _U32(0))
            if pred:
                keep = keep & ((code - lo) <= span_c)
            if narrow:
                acc = acc + jnp.where(keep, code, zero)
            else:
                acc = acc + jnp.where(keep, code & _U32(0xFFFF), zero)
                acc_hi = acc_hi + jnp.where(keep, code >> _U32(16), zero)
            if need_cnt:
                cnt = cnt + jnp.where(keep, one, zero)
            if minmax:
                # Mosaic has no arith.minui/maxui: select on cmp
                c_or_max = jnp.where(keep, code, ffff)
                c_or_min = jnp.where(keep, code, zero)
                mn = jnp.where(c_or_max < mn, c_or_max, mn)
                mx = jnp.where(c_or_min > mx, c_or_min, mx)

        def fold(x):  # (B, 8, lane8) -> (B, 8, 128) pairwise lane add
            while x.shape[2] > 128:
                h = x.shape[2] // 2
                x = x[:, :, :h] + x[:, :, h:]
            return x

        def foldm(x, is_min):
            while x.shape[2] > 128:
                h = x.shape[2] // 2
                a, b_ = x[:, :, :h], x[:, :, h:]
                x = jnp.where(a < b_ if is_min else a > b_, a, b_)
            return x

        parts = [fold(acc)]
        if not narrow:
            parts.append(fold(acc_hi))
        if need_cnt:
            parts.append(fold(cnt))
        if minmax:
            parts += [foldm(mn, True), foldm(mx, False)]
        out_ref[...] = jnp.stack(parts, axis=1)

    # index maps must stay arithmetic-free and literal-free: under
    # jax_enable_x64, computed indices AND bare Python `0` literals trace
    # as i64, which Mosaic cannot lower; np.int32 pins the dtype
    z = np.int32(0)
    n_chunks = n_seg // seg_blk
    in_specs = [
        # per-step (seg_blk, 8) scalar slice in VMEM (v2 kept it in
        # SMEM for per-segment scalar loads; v3 reads it as vectors —
        # and the round-3 crash taught us never to pass the whole
        # table as one block: n_seg=2048 padded to 1.00 MB of SMEM)
        pl.BlockSpec((seg_blk, 8), lambda c: (c, z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((seg_blk, width, 8, lane8),
                     lambda c: (c, z, z, z),
                     memory_space=pltpu.VMEM),
    ]
    if has_valid:
        in_specs.append(pl.BlockSpec((seg_blk, 1, 8, lane8),
                                     lambda c: (c, z, z, z),
                                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((seg_blk, n_out, 8, 128),
                               lambda c: (c, z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_seg, n_out, 8, 128), _U32),
        interpret=_interpret(),
    )
    return call, rows_l, narrow


def _row_layout(pred: bool, minmax: bool, narrow: bool):
    """Output-row indices per variant -> (dict, n_out)."""
    rows = {}
    i = 0
    rows["sum_lo"] = i
    i += 1
    if not narrow:
        rows["sum_hi"] = i
        i += 1
    if pred or minmax:
        rows["cnt"] = i
        i += 1
    if minmax:
        rows["min"] = i
        rows["max"] = i + 1
        i += 2
    return rows, i


@functools.lru_cache(maxsize=128)
def _build_runner(width: int, lane8: int, n_seg: int, seg_blk: int,
                  pred: bool, minmax: bool, has_valid: bool = False):
    call, rows_l, narrow = _build_table_scan(width, lane8, n_seg, seg_blk,
                                             pred, minmax, has_valid)

    @jax.jit
    def run(words, scalars, mins, valid=None):
        """-> padded int64 vector [sum, count, vmin, vmax, 0...].

        mins: (n_seg,) int64 frame-of-reference minima. vmin/vmax are in
        the VALUE domain and only meaningful when count > 0."""
        raw = call(scalars, words, valid) if has_valid \
            else call(scalars, words)
        i64 = jnp.int64
        if "cnt" in rows_l:
            cnt = raw[:, rows_l["cnt"]].astype(i64).sum(axis=(1, 2))
        else:
            # no predicate: every valid row matches
            cnt = scalars[:, 0].astype(i64)
        if narrow:
            code_sum = raw[:, rows_l["sum_lo"]].astype(i64).sum(axis=(1, 2))
        else:
            s_lo = raw[:, rows_l["sum_lo"]].astype(i64).sum(axis=(1, 2))
            s_hi = raw[:, rows_l["sum_hi"]].astype(i64).sum(axis=(1, 2))
            code_sum = s_lo + (s_hi << 16)
        seg_sum = code_sum + cnt * mins
        out = jnp.zeros((16,), i64)
        out = out.at[0].set(seg_sum.sum())
        out = out.at[1].set(cnt.sum())
        if minmax:
            mn_c = raw[:, rows_l["min"]].min(axis=(1, 2)).astype(i64)
            mx_c = raw[:, rows_l["max"]].max(axis=(1, 2)).astype(i64)
            has = cnt > 0
            big = jnp.asarray(np.iinfo(np.int64).max, i64)
            gmin = jnp.min(jnp.where(has, mn_c + mins, big))
            gmax = jnp.max(jnp.where(has, mx_c + mins, -big - 1))
            out = out.at[2].set(gmin)
            out = out.at[3].set(gmax)
        return out

    return run


def _seg_blk_for(width: int, lane8: int, n_seg: int) -> int:
    """Segments per grid step: ~BLK_BYTES of packed words, power of two."""
    seg_bytes = width * 8 * lane8 * 4
    blk = max(1, BLK_BYTES // seg_bytes)
    blk = 1 << (blk.bit_length() - 1)  # floor to power of two
    return min(blk, n_seg)


def scan_table(words: jax.Array, counts, mins, lo=None, hi=None, lanes=None,
               device_out: bool = False, minmax: bool = True, valids=None):
    """Fused compressed scan over a stacked table of same-width segments.

    words:  (n_seg, width, n_lanes) uint32 packed planes (bitpack layout);
            segments with fewer lanes are zero-padded on the lane axis
    counts: (n_seg,) valid row counts
    mins:   (n_seg,) per-segment frame-of-reference minima (python ints or
            numpy array)
    lo/hi:  inclusive predicate range in the VALUE domain (None = open)
    valids: optional (n_seg, 1, n_lanes) stacked width-1 validity planes
            (all-ones rows for fully-valid segments); NULL rows are
            excluded from sum/count
    lanes:  (n_seg,) each segment's ORIGINAL lane count (defaults to the
            stacked lane dim) — element order is i = r*lanes[s] + lane
    minmax: False skips min/max tracking (leaner kernel for sum/count)

    Returns (sum, count, vmin, vmax) as python ints; vmin/vmax only valid
    when count > 0 and minmax=True. Exact for 32-bit integer domains.
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
        if valids is not None:
            valids = jnp.pad(valids, ((0, 0), (0, 0), (0, pad)))
        n_lanes += pad
    lane8 = n_lanes // 8
    pred = not (lo is None and hi is None)
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
    # (hi_c < lo_c would wrap the kernel's unsigned span to match-all)
    empty = hi_c < lo_c
    if empty.any():
        scal[empty, 0] = 0
        scal[empty, 1] = 0
        scal[empty, 2] = 0

    words = words.reshape(n_seg, width, 8, lane8)
    has_valid = valids is not None
    if has_valid:
        valids = valids.reshape(n_seg, 1, 8, lane8)

    # launch in fixed-size segment chunks (tail padded to a power of two
    # with zero-count segments): segment counts vary per table/query, so
    # unchunked shapes would recompile per count and bloat SMEM
    dev_outs = []
    off = 0
    while off < n_seg:
        take = min(CHUNK_SEGS, n_seg - off)
        padded = 1 << (take - 1).bit_length()
        blk = _seg_blk_for(width, lane8, padded)
        w_c = words[off:off + take]
        s_c = scal[off:off + take]
        m_c = mins64[off:off + take]
        v_c = valids[off:off + take] if has_valid else None
        if padded != take:
            w_c = jnp.pad(w_c, ((0, padded - take), (0, 0), (0, 0), (0, 0)))
            s_c = np.pad(s_c, ((0, padded - take), (0, 0)))
            m_c = np.pad(m_c, (0, padded - take))
            if has_valid:
                v_c = jnp.pad(v_c, ((0, padded - take), (0, 0), (0, 0),
                                    (0, 0)))
        run = _build_runner(width, lane8, padded, blk, pred, minmax,
                            has_valid)
        if has_valid:
            dev_outs.append(run(w_c, jnp.asarray(s_c), jnp.asarray(m_c),
                                v_c))
        else:
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
    s, c, _, _ = scan_table(words[None], [count], [int(min_factor)], lo, hi,
                            minmax=False)
    return s, c


# ======================================================================
# grouped dense-domain scan-aggregate (the reference's hot analytics
# loop: PhysicalHashAggregate's perfect-hash path over a small integer
# group domain, perfect_aggregate_hashtable.cpp — here fused with the
# succinct decode: group codes and value codes bit-unpack, the value
# accumulates into per-group lane partials, all in one VMEM pass)
# ======================================================================

MAX_GROUPS = 16  # compile-time unroll bound; larger domains ride XLA


def grouped_supported(n_groups: int, gw: int, vw: int) -> bool:
    return 1 <= n_groups <= MAX_GROUPS and 1 <= gw <= 32 and 1 <= vw <= 32


@functools.lru_cache(maxsize=64)
def _build_grouped_scan(gw: int, vw: int, lane8: int, n_seg: int,
                        seg_blk: int, n_groups: int, pred: bool):
    """pallas_call: (n_seg, gw, 8, lane8) group words + (n_seg, vw, 8,
    lane8) value words + (seg_blk, 8) scalars -> per-segment
    (n_groups, 3, 8, 128) u32 partials [sum_lo, sum_hi, cnt].

    scalars row: [count, lo_code, hi_code, l_orig, gmin, 0...] — gmin is
    the segment's group-plane FOR minimum so group ids are GLOBAL.
    The value predicate (lo/hi, code space) matches scan_table's."""
    if not grouped_supported(n_groups, gw, vw):
        raise ValueError("unsupported grouped scan shape")
    gmask_val = (1 << gw) - 1 if gw < 32 else U32_MAX
    vmask_val = (1 << vw) - 1 if vw < 32 else U32_MAX
    fold_f = max(1, lane8 // 128)
    if bitpack.ROWS * 0xFFFF * fold_f >= (1 << 32):
        raise ValueError(f"segment too wide for u32 partials: lane8={lane8}")

    def kernel(scal_ref, gwords_ref, vwords_ref, out_ref):
        gmask = _U32(gmask_val)
        vmask = _U32(vmask_val)
        for s in range(seg_blk):
            count = scal_ref[s, 0].astype(_I32)
            l_orig = scal_ref[s, 3].astype(_I32)
            gmin = scal_ref[s, 4].astype(_I32)
            if pred:
                lo = scal_ref[s, 1]
                span_c = scal_ref[s, 2] - lo
            gm = gwords_ref[s]
            vm = vwords_ref[s]
            ia = jax.lax.broadcasted_iota(_I32, (8, lane8), 0)
            ib = jax.lax.broadcasted_iota(_I32, (8, lane8), 1)
            lane_g = ia * np.int32(lane8) + ib
            zero = jnp.zeros((n_groups, 8, lane8), _U32)
            one1 = jnp.full((1, 8, lane8), 1, _U32)
            acc_lo = zero
            acc_hi = zero
            cnt = zero
            # group-id plane for the broadcast compare: (G, 1, 1) iota
            gids = jax.lax.broadcasted_iota(_I32, (n_groups, 1, 1), 0)
            for r in range(bitpack.ROWS):
                gp = r * gw
                gk, goff = gp >> 5, gp & 31
                gcode = gm[gk]
                if goff:
                    gcode = gcode >> _U32(goff)
                if goff + gw > 32:
                    gcode = gcode | (gm[gk + 1] << _U32(32 - goff))
                grp = (gcode & gmask).astype(_I32) + gmin
                vp = r * vw
                vk, voff = vp >> 5, vp & 31
                vcode = vm[vk]
                if voff:
                    vcode = vcode >> _U32(voff)
                if voff + vw > 32:
                    vcode = vcode | (vm[vk + 1] << _U32(32 - voff))
                vcode = vcode & vmask
                thr = jnp.minimum(count - np.int32(r) * l_orig, l_orig)
                keep = lane_g < thr
                if pred:
                    keep = keep & ((vcode - lo) <= span_c)
                # ONE broadcast select per row: (G,8,L/8) mask from the
                # (8,L/8) group ids vs the (G,1,1) iota
                m = keep[None, :, :] & (grp[None, :, :] == gids)
                acc_lo = acc_lo + jnp.where(m, (vcode & _U32(0xFFFF))[None],
                                            zero)
                acc_hi = acc_hi + jnp.where(m, (vcode >> _U32(16))[None],
                                            zero)
                cnt = cnt + jnp.where(m, one1, zero)

            def fold(x):  # (G, 8, lane8) -> (G, 8, 128)
                while x.shape[2] > 128:
                    h = x.shape[2] // 2
                    x = x[:, :, :h] + x[:, :, h:]
                return x

            # (G, 3, 8, 128)
            out_ref[s] = jnp.stack(
                [fold(acc_lo), fold(acc_hi), fold(cnt)], axis=1)

    z = np.int32(0)
    n_chunks = n_seg // seg_blk
    call = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((seg_blk, 8), lambda c: (c, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((seg_blk, gw, 8, lane8), lambda c: (c, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_blk, vw, 8, lane8), lambda c: (c, z, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((seg_blk, n_groups, 3, 8, 128),
                               lambda c: (c, z, z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_seg, n_groups, 3, 8, 128), _U32),
        interpret=_interpret(),
    )
    return call


@functools.lru_cache(maxsize=64)
def _build_grouped_runner(gw: int, vw: int, lane8: int, n_seg: int,
                          seg_blk: int, n_groups: int, pred: bool):
    call = _build_grouped_scan(gw, vw, lane8, n_seg, seg_blk, n_groups,
                               pred)

    @jax.jit
    def run(gwords, vwords, scalars, vmins):
        """-> (n_groups, 2) int64 [sum, count] in the VALUE domain."""
        raw = call(scalars, gwords, vwords)  # (n_seg, G, 3, 8, 128)
        i64 = jnp.int64
        s_lo = raw[:, :, 0].astype(i64).sum(axis=(2, 3))  # (n_seg, G)
        s_hi = raw[:, :, 1].astype(i64).sum(axis=(2, 3))
        cnt = raw[:, :, 2].astype(i64).sum(axis=(2, 3))
        code_sum = s_lo + (s_hi << 16)
        seg_sum = code_sum + cnt * vmins[:, None]
        return jnp.stack([seg_sum.sum(axis=0), cnt.sum(axis=0)], axis=1)

    return run


def grouped_scan_table(gwords, vwords, counts, gmins, vmins, n_groups,
                       lo=None, hi=None, lanes=None):
    """Fused grouped scan: per-group (sum, count) of the value column over
    a dense group domain [0, n_groups).

    gwords/vwords: (n_seg, gw|vw, n_lanes) packed planes (group ids and
    values share the segment layout); gmins/vmins: per-segment FOR minima
    (group ids are gcode+gmin — callers pass group-domain-rebased minima);
    lo/hi: optional VALUE-domain predicate range.
    Returns (n_groups, 2) int64 [sum, count] numpy array."""
    n_seg = int(gwords.shape[0])
    gw, vw = int(gwords.shape[1]), int(vwords.shape[1])
    n_lanes = int(gwords.shape[2])
    assert int(vwords.shape[2]) == n_lanes
    counts = np.asarray(counts, dtype=np.int64)
    gmins64 = np.asarray(gmins, dtype=np.int64)
    vmins64 = np.asarray(vmins, dtype=np.int64)
    lanes_arr = (np.full(n_seg, n_lanes, np.int64) if lanes is None
                 else np.asarray(lanes, dtype=np.int64))
    if n_lanes % TILE_L:
        padl = TILE_L - n_lanes % TILE_L
        gwords = jnp.pad(gwords, ((0, 0), (0, 0), (0, padl)))
        vwords = jnp.pad(vwords, ((0, 0), (0, 0), (0, padl)))
        n_lanes += padl
    lane8 = n_lanes // 8
    pred = not (lo is None and hi is None)
    scal = np.zeros((n_seg, 8), dtype=np.uint32)
    scal[:, 0] = counts.astype(np.uint32)
    scal[:, 3] = lanes_arr.astype(np.uint32)
    scal[:, 4] = gmins64.astype(np.int32).view(np.uint32)
    lo_v = -(1 << 62) if lo is None else int(lo)
    hi_v = (1 << 62) if hi is None else int(hi)
    lo_c = np.clip(lo_v - vmins64, 0, U32_MAX)
    hi_c = np.clip(hi_v - vmins64, -1, U32_MAX)
    scal[:, 1] = lo_c.astype(np.uint32)
    scal[:, 2] = np.where(hi_c < 0, 0, hi_c).astype(np.uint32)
    empty = hi_c < lo_c
    if empty.any():
        scal[empty, 0] = 0
        scal[empty, 1] = 0
        scal[empty, 2] = 0
    gwords = gwords.reshape(n_seg, gw, 8, lane8)
    vwords = vwords.reshape(n_seg, vw, 8, lane8)

    outs = []
    off = 0
    while off < n_seg:
        take = min(CHUNK_SEGS, n_seg - off)
        padded = 1 << (take - 1).bit_length()
        blk = _seg_blk_for(gw + vw, lane8, padded)
        g_c, v_c = gwords[off:off + take], vwords[off:off + take]
        s_c = scal[off:off + take]
        m_c = vmins64[off:off + take]
        if padded != take:
            padn = padded - take
            g_c = jnp.pad(g_c, ((0, padn), (0, 0), (0, 0), (0, 0)))
            v_c = jnp.pad(v_c, ((0, padn), (0, 0), (0, 0), (0, 0)))
            s_c = np.pad(s_c, ((0, padn), (0, 0)))
            m_c = np.pad(m_c, (0, padn))
        run = _build_grouped_runner(gw, vw, lane8, padded, blk,
                                    int(n_groups), pred)
        outs.append(run(g_c, v_c, jnp.asarray(s_c), jnp.asarray(m_c)))
        off += take
    if len(outs) == 1:
        return np.asarray(outs[0])
    return np.asarray(sum(outs[1:], outs[0]))


# ======================================================================
# multi-plane multi-aggregate grouped scan (TPC-H Q1-class queries:
# several SUM/COUNT aggregates over products of decimal columns with
# conjunctive range filters, grouped by a small dense domain — the
# reference's PhysicalHashAggregate perfect-hash path over derived
# expressions, perfect_aggregate_hashtable.cpp, fused with the succinct
# decode of EVERY referenced column in one VMEM pass)
# ======================================================================

MAX_MULTI_GROUPS = 16   # one-hot accumulator height; larger domains -> XLA
MAX_MULTI_PLANES = 8
MAX_MONO_DEGREE = 3     # product aggregates of at most 3 columns

# scalar-table column layout, (n_seg, 32) uint32
_SC_COUNT = 0
_SC_LORIG = 1
_SC_GMIN = 2       # + group index j (j < 6)
_SC_VMIN = 8       # + plane index p (p < 8)
_SC_PRED = 16      # + 2*q (lo), 2*q+1 (hi) for pred q (q < 8)


def multi_supported(n_groups, n_planes, monos):
    return (1 <= n_groups <= MAX_MULTI_GROUPS
            and n_planes <= MAX_MULTI_PLANES
            and all(1 <= len(m) <= MAX_MONO_DEGREE for m in monos))


@functools.lru_cache(maxsize=64)
def _build_multi_grouped_scan(gws, vws, lane8, n_seg, seg_blk, n_groups,
                              strides, monos, preds):
    """pallas_call over per-plane packed word stacks.

    gws: widths of the group planes (value = code + gmin, gmin rebased so
         combined group ids land in [0, n_groups));
    vws: widths of the value planes (value = code + vmin, all in u32 —
         the CALLER guarantees 0 <= vmin and per-row monomial products
         < 2^32 via zonemaps);
    strides: per-group-plane dense-domain stride (static ints);
    monos: aggregate monomials, each a tuple of vws indices — the kernel
         accumulates sum(prod(v_p)) per group as split 16-bit halves;
    preds: vws indices carrying a code-space range predicate from the
         scalar table (conjunction over planes).

    Output: (n_seg, n_groups, 2*len(monos)+1, 8, 128) uint32 — per
    monomial [sum_lo, sum_hi] then the match count."""
    if not multi_supported(n_groups, len(vws), monos):
        raise ValueError("unsupported multi grouped scan shape")
    fold_f = max(1, lane8 // 128)
    if bitpack.ROWS * 0xFFFF * fold_f >= (1 << 32):
        raise ValueError(f"segment too wide for u32 partials: lane8={lane8}")
    n_mono = len(monos)
    n_out = 2 * n_mono + 1
    # planes actually needing a value (code+vmin): any monomial member
    val_planes = sorted({p for m in monos for p in m})

    def kernel(scal_ref, *refs):
        # refs = group word stacks (w>0 only) + value word stacks (w>0
        # only) + out_ref
        out_ref = refs[-1]
        gm_refs = {}
        vm_refs = {}
        k = 0
        for j, w in enumerate(gws):
            if w > 0:
                gm_refs[j] = refs[k]
                k += 1
        for p, w in enumerate(vws):
            if w > 0:
                vm_refs[p] = refs[k]
                k += 1

        count = scal_ref[:, _SC_COUNT:_SC_COUNT + 1].astype(_I32)[:, :, None]
        l_orig = scal_ref[:, _SC_LORIG:_SC_LORIG + 1].astype(_I32)[:, :, None]
        ia = jax.lax.broadcasted_iota(_I32, (8, lane8), 0)
        ib = jax.lax.broadcasted_iota(_I32, (8, lane8), 1)
        lane_g = (ia * np.int32(lane8) + ib)[None]          # (1,8,lane8)
        zero = jnp.zeros((seg_blk, 8, lane8), _U32)
        zero_g = jnp.zeros((seg_blk, n_groups, 8, lane8), _U32)
        one_g = jnp.full((seg_blk, n_groups, 8, lane8), 1, _U32)
        gids = jax.lax.broadcasted_iota(
            _I32, (1, n_groups, 1, 1), 1)                    # (1,G,1,1)
        accs = [zero_g for _ in range(2 * n_mono)]
        cnt = zero_g

        def unpack(wm, r, width):
            p_ = r * width
            k_, off = p_ >> 5, p_ & 31
            code = wm[:, k_]
            if off:
                code = code >> _U32(off)
            if off + width > 32:
                code = code | (wm[:, k_ + 1] << _U32(32 - off))
            mask_val = (1 << width) - 1 if width < 32 else U32_MAX
            return code & _U32(mask_val)

        for r in range(bitpack.ROWS):
            thr = jnp.minimum(count - np.int32(r) * l_orig, l_orig)
            keep = lane_g < thr                              # (B,8,lane8)
            for q, pi in enumerate(preds):
                lo = scal_ref[:, _SC_PRED + 2 * q:
                              _SC_PRED + 2 * q + 1][:, :, None]
                span = scal_ref[:, _SC_PRED + 2 * q + 1:
                                _SC_PRED + 2 * q + 2][:, :, None] - lo
                code = (unpack(vm_refs[pi], r, vws[pi])
                        if vws[pi] > 0 else zero)
                keep = keep & ((code - lo) <= span)
            # dense combined group id
            grp = jnp.zeros((seg_blk, 8, lane8), _I32)
            for j, w in enumerate(gws):
                gmin = scal_ref[:, _SC_GMIN + j:
                                _SC_GMIN + j + 1].astype(_I32)[:, :, None]
                gcode = (unpack(gm_refs[j], r, w).astype(_I32)
                         if w > 0 else jnp.zeros((seg_blk, 8, lane8), _I32))
                grp = grp + (gcode + gmin) * np.int32(strides[j])
            m = keep[:, None] & (grp[:, None] == gids)       # (B,G,8,L/8)
            # per-plane values (code + vmin), u32 exact by caller contract
            vals = {}
            for p in val_planes:
                vmin = scal_ref[:, _SC_VMIN + p:_SC_VMIN + p + 1][:, :, None]
                code = (unpack(vm_refs[p], r, vws[p])
                        if vws[p] > 0 else zero)
                vals[p] = code + vmin
            for mi, mono in enumerate(monos):
                term = vals[mono[0]]
                for p in mono[1:]:
                    term = term * vals[p]
                accs[2 * mi] = accs[2 * mi] + jnp.where(
                    m, (term & _U32(0xFFFF))[:, None], zero_g)
                accs[2 * mi + 1] = accs[2 * mi + 1] + jnp.where(
                    m, (term >> _U32(16))[:, None], zero_g)
            cnt = cnt + jnp.where(m, one_g, zero_g)

        def fold(x):  # (B, G, 8, lane8) -> (B, G, 8, 128)
            while x.shape[3] > 128:
                h = x.shape[3] // 2
                x = x[:, :, :, :h] + x[:, :, :, h:]
            return x

        out_ref[...] = jnp.stack([fold(a) for a in accs] + [fold(cnt)],
                                 axis=2)

    z = np.int32(0)
    n_chunks = n_seg // seg_blk
    # scalar table rides VMEM as a (seg_blk, 128) block: Mosaic requires
    # the trailing block dims to be (8k, 128)-aligned or whole-array
    in_specs = [pl.BlockSpec((seg_blk, 128), lambda c: (c, z),
                             memory_space=pltpu.VMEM)]
    for w in gws:
        if w > 0:
            in_specs.append(pl.BlockSpec((seg_blk, w, 8, lane8),
                                         lambda c: (c, z, z, z),
                                         memory_space=pltpu.VMEM))
    for w in vws:
        if w > 0:
            in_specs.append(pl.BlockSpec((seg_blk, w, 8, lane8),
                                         lambda c: (c, z, z, z),
                                         memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((seg_blk, n_groups, n_out, 8, 128),
                               lambda c: (c, z, z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_seg, n_groups, n_out, 8, 128),
                                       _U32),
        interpret=_interpret(),
    )
    return call


@functools.lru_cache(maxsize=64)
def _build_multi_runner(gws, vws, lane8, n_seg, seg_blk, n_groups,
                        strides, monos, preds):
    call = _build_multi_grouped_scan(gws, vws, lane8, n_seg, seg_blk,
                                     n_groups, strides, monos, preds)
    n_mono = len(monos)

    @jax.jit
    def run(scalars, *planes):
        """-> (n_groups, n_mono+1) int64: monomial sums then count.

        planes arrive as flat (n_seg, w, n_lanes) stacks; the (8, lane8)
        view happens HERE inside jit — outside-jit reshapes/pads each
        cost a ~25 ms dispatch through the tunneled device link and were
        the round-4 hot-query overhead."""
        planes = [p.reshape(p.shape[0], p.shape[1], 8, lane8)
                  for p in planes]
        raw = call(scalars, *planes)  # (n_seg, G, R, 8, 128)
        i64 = jnp.int64
        lo = raw[:, :, 0:2 * n_mono:2].astype(i64).sum(axis=(3, 4))
        hi = raw[:, :, 1:2 * n_mono:2].astype(i64).sum(axis=(3, 4))
        sums = (lo + (hi << 16)).sum(axis=0)              # (G, n_mono)
        cnt = raw[:, :, 2 * n_mono].astype(i64).sum(axis=(0, 2, 3))
        return jnp.concatenate([sums, cnt[:, None]], axis=1)

    return run


def multi_grouped_scan_table(gstacks, vstacks, scal, n_groups, strides,
                             monos, preds, prep_cache=None, prep_key=None):
    """Fused multi-aggregate grouped scan over one representation class.

    gstacks: list of (n_seg, w_j, n_lanes) packed group planes (w_j may
             be 0 -> pass None);
    vstacks: list of (n_seg, w_p, n_lanes) packed value planes (None for
             width-0 planes);
    scal:    (n_seg, 32) uint32 scalar table (see _SC_* layout; changes
             per query via the predicate codes, so it is NOT cached);
    prep_cache/prep_key: optional dict + key under which the chunked,
             segment-padded device stacks are cached across queries — the
             chunk prep (pad/slice) otherwise costs host->device
             dispatches per call.
    Returns (n_groups, len(monos)+1) int64 numpy [sums..., count]."""
    n_seg = int(scal.shape[0])
    gws = tuple(0 if s is None else int(s.shape[1]) for s in gstacks)
    vws = tuple(0 if s is None else int(s.shape[1]) for s in vstacks)
    stacks = [s for s in list(gstacks) + list(vstacks) if s is not None]
    if not stacks:
        # no word planes: the lane grid (and thus per-segment row
        # capacity) cannot be derived — callers must route to the host
        raise ValueError("multi grouped scan needs at least one word plane")
    n_lanes = max(int(s.shape[2]) for s in stacks)
    if n_lanes % TILE_L:
        n_lanes += TILE_L - n_lanes % TILE_L
    lane8 = n_lanes // 8
    total_w = max(1, sum(gws) + sum(vws))
    n_out = 2 * len(monos) + 1

    # chunk geometry (static given n_seg)
    chunks = []
    off = 0
    while off < n_seg:
        take = min(CHUNK_SEGS, n_seg - off)
        # pad to >= 8 segments: block sublane dims must be multiples of 8
        padded = max(8, 1 << (take - 1).bit_length())
        blk = max(8, _seg_blk_for(total_w, lane8, padded))
        blk = min(blk, padded)
        # VMEM budget: inputs + (B, G, n_out, 8, lane8) accumulators
        while blk > 8:
            est = blk * total_w * 8 * lane8 * 4 \
                + blk * n_groups * n_out * 8 * lane8 * 4
            if est <= (10 << 20):
                break
            blk //= 2
        if blk * (total_w + n_groups * n_out) * 8 * lane8 * 4 > (14 << 20):
            raise ValueError("multi grouped scan exceeds VMEM budget")
        chunks.append((off, take, padded, blk))
        off += take

    prepped = None
    if prep_cache is not None and prep_key is not None:
        prepped = prep_cache.get(("multi_prep", prep_key))
    if prepped is None:
        def prep(s):
            if s is None:
                return None
            if int(s.shape[2]) != n_lanes:
                s = jnp.pad(s, ((0, 0), (0, 0),
                                (0, n_lanes - int(s.shape[2]))))
            return s

        flat = [prep(s) for s in list(gstacks) + list(vstacks)
                if s is not None]
        prepped = []
        for off, take, padded, _blk in chunks:
            planes = [s[off:off + take] for s in flat]
            if padded != take:
                padn = padded - take
                planes = [jnp.pad(p, ((0, padn), (0, 0), (0, 0)))
                          for p in planes]
            prepped.append(tuple(planes))
        if prep_cache is not None and prep_key is not None:
            prep_cache[("multi_prep", prep_key)] = prepped

    outs = []
    for (off, take, padded, blk), planes in zip(chunks, prepped):
        s_c = scal[off:off + take]
        if padded != take:
            s_c = np.pad(s_c, ((0, padded - take), (0, 0)))
        s_c = np.pad(s_c, ((0, 0), (0, 128 - s_c.shape[1])))
        run = _build_multi_runner(gws, vws, lane8, padded, blk,
                                  int(n_groups), tuple(strides),
                                  tuple(tuple(m) for m in monos),
                                  tuple(preds))
        outs.append(run(s_c, *planes))
    if len(outs) == 1:
        return np.asarray(outs[0])
    return np.asarray(sum(outs[1:], outs[0]))
