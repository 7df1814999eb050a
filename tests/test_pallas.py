"""Pallas fused scan kernel vs the XLA decode path (exactness golden)."""

import jax
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


def test_scan_table_multi_segment_ragged():
    """Stacked multi-segment scan w/ a ragged tail + signed minima."""
    rng = np.random.default_rng(17)
    seg_rows = [8192, 8192, 5000]  # tail segment: fewer lanes
    words_l, counts, mins, alldata, lanes = [], [], [], [], []
    for k, n in enumerate(seg_rows):
        vals = (-4000 + k * 3000 + rng.integers(0, 1 << 11, n)).astype(np.int32)
        alldata.append(vals)
        p = segcodec.pack_segment(jnp.asarray(vals), tt.INTEGER)
        assert p.widths == (11,)
        L_pad = -(-p.n_lanes // pallas_scan.TILE_L) * pallas_scan.TILE_L
        w = p.words[0]
        if w.shape[1] < L_pad:
            w = jnp.pad(w, ((0, 0), (0, L_pad - w.shape[1])))
        words_l.append(w)
        counts.append(p.count)
        mins.append(p.min_factor)
        lanes.append(p.n_lanes)
    words = jnp.stack(words_l)
    a = np.concatenate(alldata).astype(np.int64)
    for lo, hi in [(-3500, 500), (None, None), (10_000, 20_000)]:
        s, c, mn, mx = pallas_scan.scan_table(words, counts, mins, lo, hi,
                                              lanes=lanes)
        m = np.ones(len(a), bool)
        if lo is not None:
            m &= (a >= lo) & (a <= hi)
        assert int(c) == int(m.sum())
        assert int(s) == int(a[m].sum())
        if m.any():
            assert (mn, mx) == (int(a[m].min()), int(a[m].max()))


def test_engine_pallas_scan_agg():
    """SELECT sum/count/min/max through the engine's Pallas fast path."""
    import adacom_tpu as at

    cfg = at.DBConfig()
    cfg.segment_rows = 4096
    cfg.pallas_scan_enabled = True
    cfg.host_scan_segment_limit = 0
    db = at.Database(config=cfg)
    con = db.connect()
    con.query("CREATE TABLE t(i INTEGER)")
    rng = np.random.default_rng(23)
    vals = rng.integers(-1000, 50_000, 10_000).astype(np.int32)
    app = con.appender("t")
    app.append_column("i", vals)
    app.close()
    db.catalog.get_column_segment_catalog().compact_all_segments()
    r = con.query(
        "SELECT count(*), sum(i), min(i), max(i) FROM t WHERE i >= 100 AND i < 30000"
    ).fetchone()
    m = (vals >= 100) & (vals < 30000)
    assert tuple(int(x) for x in r) == (
        int(m.sum()), int(vals[m].astype(np.int64).sum()),
        int(vals[m].min()), int(vals[m].max()))
    # empty range + no-filter variants
    r = con.query("SELECT count(i), sum(i) FROM t WHERE i = 99999").fetchone()
    assert int(r[0]) == 0 and r[1] is None
    r = con.query("SELECT sum(i), count(*) FROM t").fetchone()
    assert (int(r[0]), int(r[1])) == (int(vals.astype(np.int64).sum()), len(vals))
    db.close()


def test_driver_scale_kernel_builds():
    """Compile the table-scan kernel at BENCH-scale shapes without data.

    Rounds 2 and 3 both shipped kernels that passed small-shape tests and
    died at the driver's 100M-row scale (r02: x64 lowering, r03: SMEM
    overflow from the whole (2048, 8) scalar table in one block). This
    builds the exact bench shape (n_seg=2048, width=16, lane8=256 — the
    shape in BENCH_r03's crash dump) via .lower(); on the TPU lane it also
    .compile()s, which is where Mosaic enforces the 1 MB SMEM budget.
    """
    from adacom_tpu.ops import pallas_scan

    for width, lane8, n_seg in [(16, 256, 2048), (17, 128, 2048)]:
        blk = pallas_scan._seg_blk_for(width, lane8, n_seg)
        run = pallas_scan._build_runner(width, lane8, n_seg, blk,
                                        True, True)
        shapes = (
            jax.ShapeDtypeStruct((n_seg, width, 8, lane8), jnp.uint32),
            jax.ShapeDtypeStruct((n_seg, 8), jnp.uint32),
            jax.ShapeDtypeStruct((n_seg,), jnp.int64),
        )
        lowered = run.lower(*shapes)
        if jax.default_backend() == "tpu":
            lowered.compile()  # Mosaic pass: catches SMEM/VMEM overflows


def test_grouped_scan_table_matches_numpy(rng):
    """Fused grouped dense-domain aggregate (perfect-hash-aggregate
    analogue): per-group sum/count over packed group + value planes."""
    from adacom_tpu import types as tt
    from adacom_tpu.ops import segcodec

    seg_rows = 2048
    n_seg = 5
    G = 6
    gw_packs, vw_packs, gs, vs = [], [], [], []
    for s in range(n_seg):
        g = rng.integers(0, G, seg_rows).astype(np.uint32)
        v = (10_000 + rng.integers(0, 50_000, seg_rows)).astype(np.uint32)
        gs.append(g)
        vs.append(v)
        gw_packs.append(segcodec.pack_segment(jnp.asarray(g), tt.UINTEGER,
                                              vmin=0, vmax=G - 1))
        vw_packs.append(segcodec.pack_segment(jnp.asarray(v), tt.UINTEGER,
                                              vmin=10_000, vmax=60_000))
    gw = gw_packs[0].widths[0]
    vw = vw_packs[0].widths[0]
    assert all(p.widths == (gw,) for p in gw_packs)
    gwords = jnp.stack([p.words[0] for p in gw_packs])
    vwords = jnp.stack([p.words[0] for p in vw_packs])
    from adacom_tpu.ops import pallas_scan

    for lo, hi in [(None, None), (20_000, 45_000)]:
        out = pallas_scan.grouped_scan_table(
            gwords, vwords,
            counts=[seg_rows] * n_seg,
            gmins=[p.min_factor for p in gw_packs],
            vmins=[p.min_factor for p in vw_packs],
            n_groups=G, lo=lo, hi=hi)
        allg = np.concatenate(gs).astype(np.int64)
        allv = np.concatenate(vs).astype(np.int64)
        keep = np.ones(len(allv), bool)
        if lo is not None:
            keep = (allv >= lo) & (allv <= hi)
        for g in range(G):
            m = keep & (allg == g)
            assert out[g, 1] == m.sum(), (g, lo)
            assert out[g, 0] == allv[m].sum(), (g, lo)


def test_engine_pallas_grouped_agg():
    """SELECT g, sum(v), count(*), avg(v) GROUP BY g through the Pallas
    grouped dense-domain tier (perfect-hash-aggregate analogue)."""
    import adacom_tpu as at
    from adacom_tpu.ops import pallas_scan as ps

    cfg = at.DBConfig()
    cfg.segment_rows = 4096
    cfg.pallas_scan_enabled = True
    db = at.Database(config=cfg)
    con = db.connect()
    con.query("CREATE TABLE t(g INTEGER, v INTEGER)")
    rng = np.random.default_rng(31)
    g = rng.integers(0, 5, 20_000).astype(np.int32)
    v = rng.integers(100, 90_000, 20_000).astype(np.int32)
    app = con.appender("t")
    app.append_columns({"g": g, "v": v})
    app.close()
    db.catalog.get_column_segment_catalog().compact_all_segments()
    calls_before = ps._build_grouped_runner.cache_info().misses
    r = con.query("SELECT g, sum(v), count(*), avg(v) FROM t "
                  "GROUP BY g ORDER BY g").fetchall()
    assert ps._build_grouped_runner.cache_info().misses > calls_before, \
        "grouped Pallas tier did not engage"
    assert len(r) == 5
    for row in r:
        gi = int(row[0])
        m = g == gi
        assert int(row[1]) == int(v[m].astype(np.int64).sum())
        assert int(row[2]) == int(m.sum())
        assert abs(float(row[3]) - v[m].mean()) < 1e-6
    # filtered variant (value-range predicate folds into the kernel)
    r = con.query("SELECT g, count(*), sum(v) FROM t "
                  "WHERE v >= 10000 AND v < 50000 GROUP BY g ORDER BY g"
                  ).fetchall()
    for row in r:
        gi = int(row[0])
        m = (g == gi) & (v >= 10000) & (v < 50000)
        assert int(row[1]) == int(m.sum())
        assert int(row[2]) == int(v[m].astype(np.int64).sum())
    db.close()


def test_engine_pallas_scan_agg_with_nulls():
    """The Pallas tier handles validity planes: sum/count(col) exclude
    NULLs, count(*) counts all rows (round-3 weak #6: eligibility was
    'no validity')."""
    import adacom_tpu as at
    from adacom_tpu.ops import pallas_scan as ps

    cfg = at.DBConfig()
    cfg.segment_rows = 4096
    cfg.pallas_scan_enabled = True
    cfg.host_scan_segment_limit = 0
    db = at.Database(config=cfg)
    con = db.connect()
    con.query("CREATE TABLE t(i INTEGER)")
    rng = np.random.default_rng(29)
    vals = rng.integers(0, 50_000, 20_000).astype(np.int32)
    null = rng.random(20_000) < 0.15
    app = con.appender("t")
    app.append_column("i", vals, validity=~null)
    app.close()
    db.catalog.get_column_segment_catalog().compact_all_segments()
    misses0 = ps._build_runner.cache_info().misses
    r = con.query("SELECT count(*), count(i), sum(i) FROM t").fetchone()
    assert ps._build_runner.cache_info().misses > misses0, \
        "pallas tier did not engage on the validity shape"
    v64 = vals.astype(np.int64)
    assert int(r[0]) == 20_000
    assert int(r[1]) == int((~null).sum())
    assert int(r[2]) == int(v64[~null].sum())
    r = con.query("SELECT count(*), sum(i) FROM t WHERE i >= 10000 AND i < 30000").fetchone()
    m = (~null) & (vals >= 10000) & (vals < 30000)
    assert int(r[0]) == int(m.sum())
    assert int(r[1]) == int(v64[m].sum())
    db.close()
