"""ClickBench-style analytics suite over a synthetic `hits` table.

The reference ships ClickBench with its 100M-row hits dataset and answer
files (benchmark/clickbench/{queries,answers}); the dataset is not
fetchable here, so this module generates a synthetic hits table with the
columns the classic query set touches and registers a representative
subset of the 43 queries (wide aggregations, selective filters, grouped
top-k, distinct-count heavy shapes). Correctness is established
row-for-row against a sqlite oracle loaded with the same data
(tests/test_clickbench.py) — the same strategy the TPC-H suite uses.

Run: python -m adacom_tpu.bench.runner ClickBench --scale 0.1
(scale 1.0 = 10M rows; the reference corpus is 100M)."""

from __future__ import annotations

import numpy as np

BASE_ROWS = 10_000_000

PHRASES = [
    "", "", "", "", "", "",  # most hits carry no search phrase
    "weather today", "cheap flights", "python tutorial", "news",
    "maps", "translate", "pizza near me", "cat videos", "stock prices",
    "email login", "football scores", "how to cook rice",
]


def generate(scale: float = 0.01, seed: int = 20130714) -> dict:
    n = max(1024, int(BASE_ROWS * scale))
    rng = np.random.default_rng(seed)
    counter = rng.integers(1, 1 + max(4, n // 500), n).astype(np.int32)
    event_date = (15000 + rng.integers(0, 92, n)).astype(np.int32)
    event_time = event_date.astype(np.int64) * 86_400_000_000 + \
        rng.integers(0, 86_400_000_000, n)
    # Zipf-ish user population: many one-hit users, a few heavy ones
    user = (rng.zipf(1.3, n) % max(16, n // 3)).astype(np.int64) + 1
    adv = np.where(rng.random(n) < 0.92, 0,
                   rng.integers(1, 20, n)).astype(np.int32)
    region = rng.integers(1, 200, n).astype(np.int32)
    res_w = np.asarray([1024, 1280, 1366, 1440, 1536, 1600, 1920, 2560])[
        rng.integers(0, 8, n)].astype(np.int32)
    phrase = np.asarray(PHRASES, dtype=object)[
        rng.integers(0, len(PHRASES), n)]
    mobile = (rng.random(n) < 0.6).astype(np.int32)
    return {
        "hits": {
            "counterid": ("INTEGER", counter),
            "eventdate": ("INTEGER", event_date),
            "eventtime": ("BIGINT", event_time),
            "userid": ("BIGINT", user),
            "advengineid": ("INTEGER", adv),
            "regionid": ("INTEGER", region),
            "resolutionwidth": ("INTEGER", res_w),
            "searchphrase": ("VARCHAR", phrase),
            "ismobile": ("INTEGER", mobile),
        }
    }


QUERIES = {
    0: "SELECT count(*) FROM hits",
    1: "SELECT count(*) FROM hits WHERE advengineid <> 0",
    2: "SELECT sum(advengineid), count(*), avg(resolutionwidth) FROM hits",
    3: "SELECT avg(userid) FROM hits",
    4: "SELECT count(DISTINCT userid) FROM hits",
    5: "SELECT count(DISTINCT searchphrase) FROM hits",
    6: "SELECT min(eventdate), max(eventdate) FROM hits",
    7: ("SELECT advengineid, count(*) AS c FROM hits WHERE advengineid <> 0 "
        "GROUP BY advengineid ORDER BY c DESC, advengineid"),
    8: ("SELECT regionid, count(DISTINCT userid) AS u FROM hits "
        "GROUP BY regionid ORDER BY u DESC, regionid LIMIT 10"),
    9: ("SELECT regionid, sum(advengineid), count(*) AS c, "
        "avg(resolutionwidth) FROM hits GROUP BY regionid "
        "ORDER BY c DESC, regionid LIMIT 10"),
    10: ("SELECT searchphrase, count(*) AS c FROM hits "
         "WHERE searchphrase <> '' GROUP BY searchphrase "
         "ORDER BY c DESC, searchphrase LIMIT 10"),
    11: ("SELECT searchphrase, count(DISTINCT userid) AS u FROM hits "
         "WHERE searchphrase <> '' GROUP BY searchphrase "
         "ORDER BY u DESC, searchphrase LIMIT 10"),
    12: ("SELECT userid, count(*) AS c FROM hits GROUP BY userid "
         "ORDER BY c DESC, userid LIMIT 10"),
    13: ("SELECT userid, searchphrase, count(*) AS c FROM hits "
         "GROUP BY userid, searchphrase ORDER BY c DESC, userid, "
         "searchphrase LIMIT 10"),
    14: ("SELECT ismobile, regionid, count(*) AS c FROM hits "
         "GROUP BY ismobile, regionid ORDER BY c DESC, ismobile, regionid "
         "LIMIT 10"),
    15: ("SELECT userid FROM hits WHERE userid = 12345"),
    16: ("SELECT count(*) FROM hits WHERE resolutionwidth >= 1600 "
         "AND advengineid = 0 AND ismobile = 1"),
    17: ("SELECT eventdate, count(*) AS c FROM hits "
         "WHERE eventdate >= 15030 AND eventdate <= 15060 "
         "GROUP BY eventdate ORDER BY eventdate"),
    18: ("SELECT regionid, min(eventtime), max(eventtime) FROM hits "
         "GROUP BY regionid ORDER BY regionid LIMIT 20"),
    19: ("SELECT counterid, avg(resolutionwidth) AS w FROM hits "
         "GROUP BY counterid ORDER BY w DESC, counterid LIMIT 10"),
}


def load_into_engine(con, data: dict) -> None:
    for tname, cols in data.items():
        defs = ", ".join(f"{c} {ty}" for c, (ty, _) in cols.items())
        con.query(f"CREATE TABLE {tname}({defs})")
        app = con.appender(tname)
        app.append_columns({c: arr for c, (_ty, arr) in cols.items()})
        app.close()


def load_into_sqlite(lite, data: dict) -> None:
    for tname, cols in data.items():
        names = list(cols)
        lite.execute(f"CREATE TABLE {tname}({', '.join(names)})")
        arrays = [arr.tolist() for _, arr in cols.values()]
        lite.executemany(
            f"INSERT INTO {tname} VALUES ({','.join('?' * len(names))})",
            zip(*arrays))
    lite.commit()


def _register_benchmarks():
    from adacom_tpu.bench.runner import Benchmark, register

    class _CBBase(Benchmark):
        qid = 0
        nruns = 3

        def load(self, state):
            import adacom_tpu as at

            db = at.Database()
            con = db.connect()
            load_into_engine(con, generate(sf_scale(self.scale)))
            db.catalog.get_column_segment_catalog().compact_all_segments()
            state.update(db=db, con=con)

        def run(self, state):
            state["result"] = state["con"].query(QUERIES[self.qid])

        def verify(self, state):
            return None if state["result"].row_count >= 0 else "no result"

    def sf_scale(s):
        return s

    made = []
    for qid in sorted(QUERIES):
        cls = type(f"ClickBench_Q{qid}", (_CBBase,),
                   {"qid": qid, "name": f"ClickBench_Q{qid:02d}"})
        register(cls)
        made.append(cls)
    return made


_register_benchmarks()
