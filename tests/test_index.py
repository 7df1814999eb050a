"""Index tests (storage/index.py): the reference ART's capability envelope —
point lookups, uniqueness enforcement, index-scan rewrite, persistence."""

import numpy as np
import pytest

import adacom_tpu as at
from adacom_tpu.main.connection import SQLError


def _db(segment_rows=4096, path=None):
    cfg = at.DBConfig()
    cfg.segment_rows = segment_rows
    db = at.Database(path=path, config=cfg)
    return db, db.connect()


def test_create_index_and_lookup():
    db, con = _db()
    con.query("CREATE TABLE t(i BIGINT, x INTEGER)")
    app = con.appender("t")
    rng = np.random.default_rng(4)
    keys = rng.permutation(30_000).astype(np.int64)
    app.append_columns({"i": keys, "x": (keys % 7).astype(np.int32)})
    app.close()
    con.query("CREATE INDEX idx_i ON t(i)")
    for probe in (0, 17, 29_999, 12_345):
        r = con.query(f"SELECT i, x FROM t WHERE i = {probe}").fetchall()
        assert r == [(probe, probe % 7)], (probe, r)
    assert con.query("SELECT i FROM t WHERE i = -5").fetchall() == []
    con.query("DROP INDEX idx_i")
    r = con.query("SELECT i FROM t WHERE i = 17").fetchall()
    assert r == [(17, )] or r == [(17, 3)]
    db.close()


def test_unique_index_rejects_duplicates():
    db, con = _db()
    con.query("CREATE TABLE t(i INTEGER)")
    con.query("INSERT INTO t VALUES (1), (2), (3)")
    con.query("CREATE UNIQUE INDEX u ON t(i)")
    with pytest.raises(SQLError, match="duplicate"):
        con.query("INSERT INTO t VALUES (2)")
    with pytest.raises(SQLError, match="duplicate"):
        con.query("INSERT INTO t VALUES (7), (7)")
    con.query("INSERT INTO t VALUES (4)")
    assert con.query("SELECT COUNT(*) FROM t").scalar() == 4
    db.close()


def test_unique_index_existing_duplicates_rejected():
    db, con = _db()
    con.query("CREATE TABLE t(i INTEGER)")
    con.query("INSERT INTO t VALUES (1), (1)")
    with pytest.raises(SQLError, match="duplicate"):
        con.query("CREATE UNIQUE INDEX u ON t(i)")
    db.close()


def test_primary_key_constraint():
    db, con = _db()
    con.query("CREATE TABLE t(id INTEGER PRIMARY KEY, v VARCHAR)")
    con.query("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    with pytest.raises(SQLError, match="duplicate"):
        con.query("INSERT INTO t VALUES (1, 'dup')")
    # table-level constraint syntax
    con.query("CREATE TABLE t2(a INTEGER, b INTEGER, PRIMARY KEY (a))")
    con.query("INSERT INTO t2 VALUES (5, 6)")
    with pytest.raises(SQLError, match="duplicate"):
        con.query("INSERT INTO t2 VALUES (5, 9)")
    db.close()


def test_index_with_deletes():
    db, con = _db()
    con.query("CREATE TABLE t(i INTEGER)")
    app = con.appender("t")
    app.append_column("i", np.arange(10_000, dtype=np.int32))
    app.close()
    con.query("CREATE INDEX idx ON t(i)")
    con.query("DELETE FROM t WHERE i = 777")
    assert con.query("SELECT COUNT(*) FROM t WHERE i = 777").scalar() == 0
    assert con.query("SELECT COUNT(*) FROM t WHERE i = 778").scalar() == 1
    db.close()


def test_index_survives_reopen(tmp_path):
    db, con = _db(path=str(tmp_path / "d"))
    con.query("CREATE TABLE t(i INTEGER PRIMARY KEY)")
    con.query("INSERT INTO t VALUES (1), (2)")
    db.close()
    db2, con2 = _db(path=str(tmp_path / "d"))
    assert "pk_t_i" in db2.catalog.indexes
    with pytest.raises(SQLError, match="duplicate"):
        con2.query("INSERT INTO t VALUES (2)")
    db2.close()


def test_index_range_lookup_api():
    db, con = _db()
    con.query("CREATE TABLE t(i INTEGER)")
    app = con.appender("t")
    app.append_column("i", np.random.default_rng(9).permutation(20_000).astype(np.int32))
    app.close()
    idx = db.catalog.create_index("r", "t", "i")
    hits = idx.lookup_range(100, 199)
    total = sum(len(rows) for _, rows in hits)
    assert total == 100
    table = db.catalog.get_table("t")
    for seg_idx, rows in hits:
        vals = table.columns["i"].segments[seg_idx]._host_compute_values()[rows]
        assert ((vals >= 100) & (vals <= 199)).all()
    db.close()
