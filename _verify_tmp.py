import numpy as np, jax, time
t00=time.time()
def lap(msg):
    print(f"[{time.time()-t00:6.1f}s] {msg}", flush=True)
import adacom_tpu as at
lap(f"import done, backend {jax.default_backend()}")
db = at.Database()
con = db.connect()
con.query("CREATE TABLE t1(i UINTEGER, s VARCHAR, d DOUBLE)")
app = con.appender("t1")
n = 1_000_000
app.append_columns({
    "i": np.arange(n, dtype=np.uint32),
    "s": np.asarray([["alpha","beta","gamma"][k%3] for k in range(n)], dtype=object),
    "d": np.linspace(0, 1, n),
})
app.close()
lap("ingest done")
con.query("PRAGMA compact_all_segments")
lap("compact done")
print("count:", con.query("SELECT count(*) FROM t1").scalar())
lap("count done")
print("pt:", con.query("SELECT i FROM t1 WHERE i = 654321").fetchall())
lap("pt done")
print("grp:", con.query("SELECT s, count(*), sum(i) FROM t1 GROUP BY s ORDER BY s").fetchall())
lap("grp done")
t0 = time.perf_counter()
for v in range(100):
    r = con.query(f"SELECT i FROM t1 WHERE i = {v*7777}")
dt = time.perf_counter() - t0
lap(f"100 point lookups: {dt*1000:.1f} ms total, {dt*10:.2f} ms/query")
from adacom_tpu.main.connection import SQLError
try: con.query("SELECT nope FROM t1")
except SQLError as e: print("probe bad col ->", e)
print("probe empty:", con.query("SELECT i FROM t1 WHERE i = 999999999").fetchall())
print("probe tail:", con.query("SELECT count(*) FROM t1 WHERE i > 999998").fetchall())
lap("all done")
