"""Funnel analysis: hand-computed truth, DuckDB SQL parity on the real
events table, plan shape (single shuffle, JVM fold)."""

import duckdb

from mysql_syncer_spark.operators.funnel import funnel_counts, funnel_stages

STEPS = ["signup", "click", "purchase"]


def test_funnel_stages_hand_truth(spark):
    rows = [
        # u1 completes all three in order
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: purchase BEFORE click → stops at stage 1 (signup) then
        # clicks later → stage 2; the early purchase must not count
        (2, 10, "signup"), (2, 15, "purchase"), (2, 20, "click"),
        # u3 clicks without signup → stage 0
        (3, 10, "click"), (3, 20, "purchase"),
        # u4: simultaneous signup+click (equal ts counts, order by step)
        (4, 10, "signup"), (4, 10, "click"),
        # u5: only irrelevant events → absent
        (5, 10, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {r["user_id"]: (r["stage"], r["stage_ts"])
           for r in funnel_stages(df, STEPS).collect()}
    assert got[1] == (3, 30)
    assert got[2] == (2, 20)
    assert got[3] == (0, None)
    assert got[4] == (2, 10)
    assert 5 not in got

    counts = {r["step"]: r["n_users"] for r in funnel_counts(df, STEPS).collect()}
    assert counts == {1: 3, 2: 3, 3: 1}  # u1,u2,u4 reached ≥1 and ≥2; u1 ≥3


def test_funnel_matches_duckdb_on_events(spark):
    """Same semantics in pure SQL over the real events table: per user,
    stage = ordered first-completion walk."""
    sf = "/root/testdata/sf0.01"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = {r["user_id"]: r["stage"]
           for r in funnel_stages(ev, STEPS).collect()}

    con = duckdb.connect()
    con.execute(f"create view events as select * from '{sf}/events.parquet'")
    oracle = con.execute("""
        WITH s1 AS (SELECT user_id, min(ts) t1 FROM events
                    WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) t2 FROM events e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) t3 FROM events e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1),
        base AS (SELECT DISTINCT user_id FROM events
                 WHERE event_type IN ('signup','click','purchase'))
        SELECT base.user_id,
               CASE WHEN t3 IS NOT NULL THEN 3
                    WHEN t2 IS NOT NULL THEN 2
                    WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
        FROM base LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """).fetchall()
    want = dict(oracle)
    assert got == want and len(got) > 100


def test_funnel_plan_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, 10, "signup")], "user_id long, ts long, event_type string"
    )
    plan = (
        funnel_stages(df, STEPS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan and "BatchEval" not in plan
