"""Concurrent write/read workloads (VERDICT round 2 missing #7).

The engine's documented transaction model (ARCHITECTURE.md): single
writer per table (append lock), readers see sealed segments + staged
tail, BEGIN/ROLLBACK restores a snapshot. These tests exercise what that
model promises under real thread concurrency — the reference's
interquery parallelism tests (test/sql/parallelism/interquery) for this
engine's reduction."""

import threading

import numpy as np
import pytest

import adacom_tpu as at


@pytest.fixture
def db():
    cfg = at.DBConfig()
    cfg.segment_rows = 2048
    d = at.Database(config=cfg)
    yield d
    d.close()


def test_concurrent_appenders_lose_nothing(db, rng):
    con = db.connect()
    con.query("CREATE TABLE t(i BIGINT)")
    n_threads, per_batch, n_batches = 8, 1000, 10
    errs = []

    def writer(tid):
        try:
            c = db.connect()
            for b_ in range(n_batches):
                app = c.appender("t")
                vals = np.full(per_batch, tid * 1_000_000 + b_, np.int64)
                app.append_column("i", vals)
                app.close()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(k,)) for k in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    r = con.query("SELECT count(*), sum(i) FROM t").fetchone()
    assert int(r[0]) == n_threads * per_batch * n_batches
    exp = sum(per_batch * (tid * 1_000_000 + b_)
              for tid in range(n_threads) for b_ in range(n_batches))
    assert int(r[1]) == exp


def test_readers_during_writes_see_consistent_prefixes(db):
    wcon = db.connect()
    wcon.query("CREATE TABLE t(i BIGINT)")
    stop = threading.event = threading.Event()
    bad = []

    def reader():
        # any exception here (e.g. the round-4 IndexError from a popped
        # segment list) must FAIL the test, not silently kill the thread
        try:
            c = db.connect()
            last = 0
            while not stop.is_set():
                r = c.query("SELECT count(*), sum(i) FROM t").fetchone()
                n, s = int(r[0]), int(r[1] or 0)
                # appended values are all 1: a consistent snapshot has
                # s == n, and row counts never go backwards
                if s != n or n < last:
                    bad.append((n, s, last))
                    return
                last = n
        except Exception as e:
            bad.append(("reader died", repr(e)))
            raise

    rt = threading.Thread(target=reader)
    rt.start()
    for _ in range(50):
        app = wcon.appender("t")
        app.append_column("i", np.ones(500, np.int64))
        app.close()
    stop.set()
    rt.join()
    assert not bad, bad[:3]
    assert int(wcon.query("SELECT count(*) FROM t").scalar()) == 25_000


def test_rollback_under_concurrent_reads(db):
    wcon = db.connect()
    wcon.query("CREATE TABLE t(i BIGINT)")
    app = wcon.appender("t")
    app.append_column("i", np.arange(5000, dtype=np.int64))
    app.close()
    base_sum = int(np.arange(5000).sum())

    wcon.query("BEGIN TRANSACTION")
    wcon.query("INSERT INTO t VALUES (999999)")
    wcon.query("ROLLBACK")
    r = wcon.query("SELECT count(*), sum(i) FROM t").fetchone()
    assert (int(r[0]), int(r[1])) == (5000, base_sum)

    # committed txn persists
    wcon.query("BEGIN TRANSACTION")
    wcon.query("INSERT INTO t VALUES (7)")
    wcon.query("COMMIT")
    r = wcon.query("SELECT count(*), sum(i) FROM t").fetchone()
    assert (int(r[0]), int(r[1])) == (5001, base_sum + 7)


def test_concurrent_distinct_tables(db):
    """Writers on distinct tables + readers on both, fully parallel."""
    con = db.connect()
    con.query("CREATE TABLE a(i BIGINT)")
    con.query("CREATE TABLE b2(i BIGINT)")
    errs = []

    def w(tname, k):
        try:
            c = db.connect()
            for _ in range(20):
                app = c.appender(tname)
                app.append_column("i", np.full(200, k, np.int64))
                app.close()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=w, args=("a", 1)),
          threading.Thread(target=w, args=("b2", 2))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert int(con.query("SELECT sum(i) FROM a").scalar()) == 20 * 200
    assert int(con.query("SELECT sum(i) FROM b2").scalar()) == 2 * 20 * 200


def test_mvcc_reader_sees_only_committed():
    """While a transaction writes, OTHER connections read the committed
    watermark + committed delete masks; commit publishes atomically
    (reference chunk_info.cpp visibility + LocalStorage semantics)."""
    import numpy as np

    import adacom_tpu as at

    db = at.Database(config=at.DBConfig(segment_rows=1024))
    w = db.connect()
    r = db.connect()
    w.query("CREATE TABLE t(i INTEGER)")
    app = w.appender("t")
    app.append_column("i", np.arange(5000, dtype=np.int32))
    app.close()
    assert r.query("SELECT count(*) FROM t").fetchone()[0] == 5000

    w.query("BEGIN TRANSACTION")
    w.query("INSERT INTO t VALUES (111111), (222222)")
    w.query("DELETE FROM t WHERE i < 100")
    # writer sees its own effects
    assert w.query("SELECT count(*) FROM t").fetchone()[0] == 5000 + 2 - 100
    # reader still sees the committed state
    assert r.query("SELECT count(*) FROM t").fetchone()[0] == 5000
    assert r.query("SELECT count(*) FROM t WHERE i = 111111").fetchone()[0] == 0
    assert r.query("SELECT count(*) FROM t WHERE i < 100").fetchone()[0] == 100
    w.query("COMMIT")
    assert r.query("SELECT count(*) FROM t").fetchone()[0] == 4902
    assert r.query("SELECT count(*) FROM t WHERE i = 111111").fetchone()[0] == 1
    db.close()


def test_mvcc_write_write_conflict():
    """A second concurrent write transaction on the same table aborts
    (reference optimistic-conflict TransactionException)."""
    import numpy as np

    import adacom_tpu as at
    from adacom_tpu.main.connection import SQLError

    db = at.Database()
    a = db.connect()
    b = db.connect()
    a.query("CREATE TABLE t(i INTEGER)")
    a.query("INSERT INTO t VALUES (1), (2)")
    a.query("BEGIN TRANSACTION")
    a.query("INSERT INTO t VALUES (3)")
    b.query("BEGIN TRANSACTION")
    try:
        b.query("INSERT INTO t VALUES (4)")
        raised = False
    except SQLError:
        raised = True
    assert raised, "second writer should conflict"
    b.query("ROLLBACK")
    a.query("COMMIT")
    # after the first commit the table is writable again
    b.query("BEGIN TRANSACTION")
    b.query("INSERT INTO t VALUES (5)")
    b.query("COMMIT")
    assert a.query("SELECT count(*) FROM t").fetchone()[0] == 4
    db.close()


def test_mvcc_rollback_restores_and_releases():
    import numpy as np

    import adacom_tpu as at

    db = at.Database(config=at.DBConfig(segment_rows=1024))
    w = db.connect()
    r = db.connect()
    w.query("CREATE TABLE t(i INTEGER)")
    app = w.appender("t")
    app.append_column("i", np.arange(3000, dtype=np.int32))
    app.close()
    w.query("BEGIN TRANSACTION")
    w.query("INSERT INTO t VALUES (9999999)")
    w.query("DELETE FROM t WHERE i >= 2000")
    # 1000 original rows AND the freshly inserted 9999999 are deleted
    assert w.query("SELECT count(*) FROM t").fetchone()[0] == 2000
    w.query("ROLLBACK")
    for con in (w, r):
        assert con.query("SELECT count(*) FROM t").fetchone()[0] == 3000
        assert con.query("SELECT count(*) FROM t WHERE i = 9999999"
                         ).fetchone()[0] == 0
    # table is writable after rollback
    r.query("BEGIN TRANSACTION")
    r.query("INSERT INTO t VALUES (7)")
    r.query("COMMIT")
    assert w.query("SELECT count(*) FROM t").fetchone()[0] == 3001
    db.close()


def test_scan_vs_append_segment_race_stress():
    """Round-4 confirmed race: a zonemap candidate list outlived a
    concurrent unseal-partial segment-list pop and scans threw
    IndexError (exec/executor.py round-4 line 1261 -> storage/table.py
    392). Scans now pin a TableSnapshot under the append lock. Small
    segments + small batches maximize tail pops; pre-fix this failed in
    well under a second."""
    import time

    cfg = at.DBConfig()
    cfg.segment_rows = 256
    db = at.Database(config=cfg)
    try:
        wcon = db.connect()
        wcon.query("CREATE TABLE t(i BIGINT)")
        stop = threading.Event()
        bad = []

        def reader():
            try:
                c = db.connect()
                while not stop.is_set():
                    # filtered scan: exercises zonemap candidates + host
                    # eq path; count query exercises the agg scan path
                    c.query("SELECT count(*) FROM t WHERE i = 1").fetchone()
                    c.query("SELECT count(*), sum(i) FROM t").fetchone()
            except Exception as e:
                bad.append(repr(e))
                raise

        rts = [threading.Thread(target=reader) for _ in range(2)]
        for t in rts:
            t.start()
        deadline = time.time() + 4.0
        while time.time() < deadline:
            app = wcon.appender("t")
            app.append_column("i", np.ones(100, np.int64))
            app.close()
        stop.set()
        for t in rts:
            t.join()
        assert not bad, bad[:3]
    finally:
        db.close()


def test_delete_masks_are_pinned_versions(db):
    """mark_deleted is copy-on-write: a reader's snapshot keeps a stable
    delete-mask version while a concurrent writer deletes (step toward
    reference chunk_info.cpp version arrays, VERDICT r4 next #10)."""
    wcon = db.connect()
    wcon.query("CREATE TABLE t(i BIGINT)")
    app = wcon.appender("t")
    app.append_column("i", np.arange(20_000, dtype=np.int64))
    app.close()
    stop = threading.Event()
    bad = []

    def reader():
        try:
            c = db.connect()
            while not stop.is_set():
                n = int(c.query(
                    "SELECT count(*) FROM t WHERE i >= 0").scalar())
                # deletes happen in 1000-row statements: any observed
                # count must be a consistent prefix multiple
                if n % 1000 != 0:
                    bad.append(n)
                    return
        except Exception as e:
            bad.append(repr(e))
            raise

    rt = threading.Thread(target=reader)
    rt.start()
    for k in range(0, 20_000, 1000):
        wcon.query(f"DELETE FROM t WHERE i >= {k} AND i < {k + 1000}")
    stop.set()
    rt.join()
    assert not bad, bad[:3]
    assert int(wcon.query("SELECT count(*) FROM t").scalar()) == 0


def test_concurrent_reader_with_delete_update_mix(db):
    """Readers stay consistent while a writer interleaves DELETE and
    UPDATE statements (VERDICT r4 next #10: version-pinned delete masks
    under mixed DML). Invariant: the table holds rows 0..9999 with
    value v in {orig, orig+1000000}; a reader must never see a count
    outside [9000, 10000] (deletes remove exactly rows 0..999 at the
    end) nor a sum that mixes a partially-applied statement."""
    wcon = db.connect()
    wcon.query("CREATE TABLE t(i BIGINT, v BIGINT)")
    app = wcon.appender("t")
    app.append_columns({
        "i": np.arange(10_000, dtype=np.int64),
        "v": np.arange(10_000, dtype=np.int64)})
    app.close()
    stop = threading.Event()
    bad = []

    def reader():
        try:
            c = db.connect()
            while not stop.is_set():
                n = int(c.query("SELECT count(*) FROM t").scalar())
                if not (9_000 <= n <= 10_000):
                    bad.append(("count", n))
                    return
        except Exception as e:
            bad.append(repr(e))
            raise

    rts = [threading.Thread(target=reader) for _ in range(2)]
    for t in rts:
        t.start()
    # interleave UPDATEs (delete+reappend) and a DELETE
    for k in range(0, 9_000, 1_000):
        wcon.query(f"UPDATE t SET v = v + 1000000 WHERE i >= {k} "
                   f"AND i < {k + 1000}")
    wcon.query("DELETE FROM t WHERE i < 1000")
    stop.set()
    for t in rts:
        t.join()
    assert not bad, bad[:3]
    r = wcon.query("SELECT count(*), sum(v) FROM t").fetchone()
    assert int(r[0]) == 9_000
    # updates covered i in [0, 9000); survivors are 1000..9999,
    # so 8000 surviving rows carry the +1e6
    exp = int(np.arange(1000, 10_000).sum()) + 8_000 * 1_000_000
    assert int(r[1]) == exp
