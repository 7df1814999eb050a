"""Distributed query operators: SPMD scan/aggregate, all-to-all shuffle,
hash-partitioned group-by, broadcast joins.

Design per SURVEY.md §5.8: segments shard over the mesh's segment axis;
each device decodes + filters + partially aggregates its local segments
(vmap over the segment dim — the fused kernel is the same one single-chip
scans use), and partial states merge with `psum` inside `shard_map`.
Repartitioning uses `all_to_all` on fixed-capacity bins with validity
masks (static shapes; skew handling = capacity headroom + overflow count
reporting)."""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from adacom_tpu.parallel.mesh import SEG_AXIS
from adacom_tpu.ops import bitpack


# ======================================================================
# distributed scan + aggregate
# ======================================================================


def make_distributed_scan_agg(mesh, widths: Tuple[int, ...], n_lanes: int,
                              agg: str = "sum_count",
                              predicate: Optional[Callable] = None):
    """Build a jitted SPMD scan-aggregate over stacked packed segments.

    Inputs (sharded over the segment axis on dim 0):
      words:  (n_seg, width_total, n_lanes) uint32 — stacked packed planes
      mins:   (n_seg,) frame-of-reference minima
      counts: (n_seg,) valid row counts
    plus replicated predicate params. Output: replicated aggregate.

    The per-device body decodes with the same vertical-layout kernel as
    single-chip scans (ops/bitpack.py) and psum-merges partials — the
    reference's local/global sink state merge (SURVEY.md §2.2) mapped onto
    ICI collectives."""
    (w,) = widths  # single 32-bit plane (u32 data)
    n_pad = bitpack.ROWS * n_lanes

    def seg_partial(words, mn, count, params):
        codes = bitpack.unpack(words, width=w).reshape(-1)
        vals = codes + mn
        idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).squeeze(-1)
        mask = idx < count
        if predicate is not None:
            mask = mask & predicate(vals, params)
        cnt = jnp.sum(mask.astype(jnp.int64))
        s = jnp.sum(jnp.where(mask, vals.astype(jnp.int64), 0))
        return s, cnt

    def device_body(words, mins, counts, params):
        s, c = jax.vmap(seg_partial, in_axes=(0, 0, 0, None))(
            words, mins, counts, params
        )
        s = jax.lax.psum(jnp.sum(s), SEG_AXIS)
        c = jax.lax.psum(jnp.sum(c), SEG_AXIS)
        return s, c

    sharded = shard_map(
        device_body,
        mesh=mesh,
        in_specs=(P(SEG_AXIS, None, None), P(SEG_AXIS), P(SEG_AXIS), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def stack_packed_segments(packed_list, n_lanes: int):
    """Stack same-width PackedData into (n_seg, w, L) + minima + counts."""
    words = jnp.stack([p.words[0] for p in packed_list])
    mins = jnp.asarray([p.min_factor for p in packed_list], dtype=jnp.uint32)
    counts = jnp.asarray([p.count for p in packed_list], dtype=jnp.int32)
    return words, mins, counts


# ======================================================================
# all-to-all hash repartition (the exchange operator)
# ======================================================================


def make_hash_repartition(mesh, capacity: int, n_payloads: int = 0):
    """Build a jitted SPMD hash-repartition.

    Each device bins its local (keys, payloads...) rows by
    `hash(key) % n_devices` into fixed-capacity bins, then all_to_all
    exchanges bins so device i ends up with every row whose key hashes to
    i. Static shapes: each device sends exactly `capacity` slots per
    destination; real rows are flagged by the returned validity mask, and
    per-destination overflow counts are returned for skew diagnostics
    (skew-aware re-splitting is a later milestone)."""
    n_dev = mesh.devices.size

    def device_body(keys, valid, *payloads):
        # keys: (n_local,) int64; valid: (n_local,) bool
        h = _hash64(keys)
        dest = (h % np.uint64(n_dev)).astype(jnp.int32)
        dest = jnp.where(valid, dest, n_dev)  # invalid rows -> dropped
        # stable order of rows per destination bin
        slot_in_dest = _rank_within(dest, n_dev + 1, keys.shape[0])
        target = dest * capacity + jnp.minimum(slot_in_dest, capacity - 1)
        overflow = jnp.zeros((n_dev,), jnp.int32).at[jnp.minimum(dest, n_dev - 1)].add(
            ((slot_in_dest >= capacity) & (dest < n_dev)).astype(jnp.int32)
        )
        drop = (dest >= n_dev) | (slot_in_dest >= capacity)
        target = jnp.where(drop, n_dev * capacity, target)

        def scatter(x, fill):
            out = jnp.full((n_dev * capacity + 1,), fill, x.dtype)
            out = out.at[target].set(x, mode="drop")
            return out[:-1].reshape(n_dev, capacity)

        k_bins = scatter(keys, jnp.zeros((), keys.dtype))
        v_bins = scatter(valid & ~drop, jnp.zeros((), jnp.bool_))
        p_bins = [scatter(p, jnp.zeros((), p.dtype)) for p in payloads]

        # exchange: dim 0 = destination device
        k_out = jax.lax.all_to_all(k_bins, SEG_AXIS, 0, 0, tiled=True)
        v_out = jax.lax.all_to_all(v_bins, SEG_AXIS, 0, 0, tiled=True)
        p_out = [jax.lax.all_to_all(p, SEG_AXIS, 0, 0, tiled=True) for p in p_bins]
        return (k_out, v_out, jax.lax.psum(overflow, SEG_AXIS), *p_out)

    out_specs = (P(SEG_AXIS), P(SEG_AXIS), P()) + tuple(
        P(SEG_AXIS) for _ in range(n_payloads)
    )
    sharded = shard_map(
        device_body,
        mesh=mesh,
        in_specs=(P(SEG_AXIS), P(SEG_AXIS)) + tuple(P(SEG_AXIS) for _ in range(n_payloads)),
        out_specs=out_specs,
    )
    return jax.jit(sharded)


def make_distributed_groupby_sum(mesh, capacity: int, domain: int):
    """Hash-repartition keys, then dense scatter-add per device, then
    all_gather the per-device dense partials masked to owned keys.

    Returns jitted fn(keys(int64 sharded), valid, values(int64 sharded)) ->
    (sums (domain,), counts (domain,)) replicated. Keys must lie in
    [0, domain)."""
    n_dev = mesh.devices.size
    repart = None  # fused below

    def device_body(keys, valid, values):
        h = _hash64(keys)
        dest = (h % np.uint64(n_dev)).astype(jnp.int32)
        dest = jnp.where(valid, dest, n_dev)
        slot = _rank_within(dest, n_dev + 1, keys.shape[0])
        drop = (dest >= n_dev) | (slot >= capacity)
        target = jnp.where(drop, n_dev * capacity, dest * capacity + jnp.minimum(slot, capacity - 1))

        def scatter(x, fill):
            out = jnp.full((n_dev * capacity + 1,), fill, x.dtype)
            out = out.at[target].set(x, mode="drop")
            return out[:-1].reshape(n_dev, capacity)

        k_b = scatter(keys, jnp.zeros((), keys.dtype))
        v_b = scatter(valid & ~drop, jnp.zeros((), jnp.bool_))
        x_b = scatter(values, jnp.zeros((), values.dtype))
        k_r = jax.lax.all_to_all(k_b, SEG_AXIS, 0, 0, tiled=True).reshape(-1)
        v_r = jax.lax.all_to_all(v_b, SEG_AXIS, 0, 0, tiled=True).reshape(-1)
        x_r = jax.lax.all_to_all(x_b, SEG_AXIS, 0, 0, tiled=True).reshape(-1)
        # local dense aggregate over owned keys
        gid = jnp.where(v_r, k_r.astype(jnp.int32), domain)
        sums = jnp.zeros((domain + 1,), values.dtype).at[gid].add(
            jnp.where(v_r, x_r, jnp.zeros((), values.dtype))
        )[:domain]
        cnts = jnp.zeros((domain + 1,), jnp.int64).at[gid].add(
            v_r.astype(jnp.int64)
        )[:domain]
        # each key lives on exactly one device -> psum merges disjoint stripes
        return jax.lax.psum(sums, SEG_AXIS), jax.lax.psum(cnts, SEG_AXIS)

    sharded = shard_map(
        device_body, mesh=mesh,
        in_specs=(P(SEG_AXIS), P(SEG_AXIS), P(SEG_AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def broadcast_small(mesh, arr):
    """Replicate a small build side to all devices (broadcast join side)."""
    return jax.device_put(arr, NamedSharding(mesh, P()))


# ======================================================================
# helpers
# ======================================================================


def _hash64(x):
    """splitmix64 finalizer (vectorized)."""
    z = x.astype(jnp.uint64)
    z = (z ^ (z >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return z ^ (z >> jnp.uint64(31))


def _rank_within(dest, n_bins: int, n: int):
    """slot_in_dest[i] = number of earlier rows with the same dest.

    O(n_bins * n) elementwise via cumsum per bin — fine for small bin
    counts (device counts); a Pallas multi-split is a later milestone."""
    ranks = jnp.zeros((n,), jnp.int32)
    for b_ in range(n_bins):
        is_b = dest == b_
        r = jnp.cumsum(is_b.astype(jnp.int32)) - 1
        ranks = jnp.where(is_b, r, ranks)
    return ranks
