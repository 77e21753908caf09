"""As-of join and range join: DuckDB ASOF JOIN oracle parity, tolerance,
plan shape (no broadcast-nested-loop / cartesian)."""

import duckdb
import numpy as np

from mysql_syncer_spark.operators.temporal import asof_join, range_join


def _asof_fixtures():
    rng = np.random.default_rng(9)
    keys = [f"k{i}" for i in range(8)]
    quotes = [  # (key, ts, px)
        (keys[int(rng.integers(0, 8))], int(rng.integers(0, 10_000)),
         round(float(rng.normal(100, 5)), 2))
        for _ in range(400)
    ]
    trades = [
        (keys[int(rng.integers(0, 8))], int(rng.integers(0, 10_000)),
         int(rng.integers(1, 50)))
        for _ in range(200)
    ]
    return quotes, trades


def test_asof_join_matches_duckdb(spark):
    quotes, trades = _asof_fixtures()
    ldf = spark.createDataFrame(trades, "key string, ts long, qty int")
    rdf = spark.createDataFrame(quotes, "key string, ts long, px double")
    got = {
        (r["key"], r["ts"], r["qty"]): (r["ts_right"], r["px_right"])
        for r in asof_join(ldf, rdf, on=["key"]).collect()
    }

    con = duckdb.connect()
    con.execute("create table t(key text, ts bigint, qty int)")
    con.execute("create table q(key text, ts bigint, px double)")
    con.executemany("insert into t values (?,?,?)", trades)
    con.executemany("insert into q values (?,?,?)", quotes)
    oracle = con.execute(
        "select t.key, t.ts, t.qty, q.ts, q.px from t "
        "asof left join q on t.key = q.key and t.ts >= q.ts"
    ).fetchall()
    want = {(k, ts, qty): (rts, px) for k, ts, qty, rts, px in oracle}
    assert len(got) == len(want) == len(set((k, ts, q) for k, ts, q in trades))
    assert got == want


def test_asof_tolerance_and_equal_ts(spark):
    ldf = spark.createDataFrame(
        [("a", 100, "probe1"), ("a", 250, "probe2"), ("b", 50, "probe3")],
        "key string, ts long, tag string",
    )
    rdf = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 90, 2.0)], "key string, ts long, v double"
    )
    out = {r["tag"]: (r["ts_right"], r["v_right"])
           for r in asof_join(ldf, rdf, on=["key"]).collect()}
    assert out["probe1"] == (100, 1.0)  # equal ts matches (at-or-before)
    assert out["probe2"] == (100, 1.0)
    assert out["probe3"] == (None, None)  # no right rows for key b

    tol = {r["tag"]: r["v_right"]
           for r in asof_join(ldf, rdf, on=["key"], tolerance=50).collect()}
    assert tol["probe1"] == 1.0 and tol["probe2"] is None  # 150 > 50 stale


def test_asof_plan_single_exchange(spark):
    ldf = spark.createDataFrame([("a", 1, 1)], "key string, ts long, qty int")
    rdf = spark.createDataFrame([("a", 1, 1.0)], "key string, ts long, px double")
    plan = (
        asof_join(ldf, rdf, on=["key"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange") == 1, plan  # one shuffle on the key


def test_range_join_inner_left_and_plan(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 3600), (3, 7200), (4, 99_999)], "pid int, t long"
    )
    rng = spark.createDataFrame(
        [(10, 0, 3600), (20, 3600, 10_800), (30, 7000, 7300)],
        "rid int, start long, end long",
    )
    inner = {(r["pid"], r["rid"]) for r in
             range_join(pts, rng, "t", bin_width=3600).collect()}
    # p=5 in [0,3600); 3600 in [3600,10800); 7200 in both [3600,10800) and [7000,7300)
    assert inner == {(1, 10), (2, 20), (3, 20), (3, 30)}

    left = range_join(pts, rng, "t", bin_width=3600, how="left")
    rows = {(r["pid"], r["rid"]) for r in left.collect()}
    assert (4, None) in rows and len(rows) == 5

    plan = (
        range_join(pts, rng, "t", bin_width=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_asof_bucketed_differential(spark):
    """asof_join_bucketed equals asof_join on random data (unique ts per
    key so tie-order cannot differ), across bucket widths including ones
    smaller and larger than typical gaps."""
    from mysql_syncer_spark.operators.temporal import asof_join_bucketed

    rng = np.random.default_rng(21)
    keys = [f"k{i}" for i in range(6)]
    quotes, trades = [], []
    for k in keys:
        ts_pool = rng.permutation(20_000)[:300]  # unique per key
        quotes += [(k, int(t), float(round(rng.normal(100, 5), 2)))
                   for t in ts_pool[:150]]
        trades += [(k, int(t), int(rng.integers(1, 9)))
                   for t in ts_pool[150:]]
    ldf = spark.createDataFrame(trades, "key string, ts long, qty int")
    rdf = spark.createDataFrame(quotes, "key string, ts long, px double")

    base = {(r["key"], r["ts"]): (r["ts_right"], r["px_right"])
            for r in asof_join(ldf, rdf, on=["key"]).collect()}
    for width in (100, 3600, 1_000_000):
        got = {
            (r["key"], r["ts"]): (r["ts_right"], r["px_right"])
            for r in asof_join_bucketed(
                ldf, rdf, on=["key"], bucket_width=width
            ).collect()
        }
        assert got == base, width

    # the big window partitions by (key, bucket), not key alone
    plan = (
        asof_join_bucketed(ldf, rdf, on=["key"], bucket_width=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_bkt" in plan
