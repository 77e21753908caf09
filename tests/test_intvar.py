"""P7 INTVAR/auto-increment capture semantics."""

from mysql_syncer_spark.operators.filters import op_filter
from mysql_syncer_spark.operators.intvar import with_auto_increment

SCHEMA = "log_pos long, file_seq int, op string, intvar long"


def test_intvar_applies_to_next_insert_only(spark):
    rows = [
        (0, 0, "INTVAR", 100),
        (1, 0, "I", None),       # takes 100
        (2, 0, "I", None),       # consumed — no id
        (3, 0, "INTVAR", 200),
        (4, 0, "U", None),       # update never takes the id
        (5, 0, "I", None),       # id was for pos 4's slot — NOT applied
        (6, 0, "INTVAR", 300),
        (7, 1, "I", None),       # DIFFERENT file: never crosses rotation
    ]
    out = {
        r["log_pos"]: r["auto_increment_id"]
        for r in with_auto_increment(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert out[1] == 100
    assert out[2] is None
    assert out[4] is None
    assert out[5] is None
    assert out[7] is None


def test_intvar_events_skip_without_decode(spark):
    """Streams containing INTVAR rows pass through the standard op filter
    (skip-with-position-advance, like every unhandled type)."""
    rows = [(0, 0, "INTVAR", 1), (1, 0, "I", None), (2, 0, "D", None)]
    kept = op_filter(spark.createDataFrame(rows, SCHEMA)).collect()
    assert sorted(r["op"] for r in kept) == ["D", "I"]


def test_intvar_bucketed_equals_simple(spark):
    """Differential: tiny pos buckets (width 4) force many ranges and
    empty gaps; the carry path must reproduce the single-window result —
    including INTVAR→INSERT adjacency straddling a range boundary."""
    import random

    rng = random.Random(7)
    rows, pos = [], 0
    for _ in range(400):
        pos += rng.randint(1, 9)  # gaps leave some width-4 buckets empty
        op = rng.choice(["INTVAR", "I", "U", "D", "I", "INTVAR"])
        rows.append(
            (pos, rng.randint(0, 2), op,
             rng.randint(1, 10**6) if op == "INTVAR" else None)
        )
    df = spark.createDataFrame(rows, SCHEMA)
    simple = {
        (r["file_seq"], r["log_pos"]): r["auto_increment_id"]
        for r in with_auto_increment(df).collect()
    }
    bucketed = {
        (r["file_seq"], r["log_pos"]): r["auto_increment_id"]
        for r in with_auto_increment(df, pos_bucket_bytes=4).collect()
    }
    assert bucketed == simple
    assert any(v is not None for v in simple.values())


def test_intvar_bucketed_semantics(spark):
    rows = [
        (0, 0, "INTVAR", 100),
        (1, 0, "I", None),       # takes 100 (same bucket)
        (7, 0, "INTVAR", 200),
        (8, 0, "I", None),       # takes 200 ACROSS the width-4 boundary
        (17, 0, "I", None),      # bucket 4; prev present bucket's last is
                                 # an insert — no id
        (33, 1, "I", None),      # other file, no predecessor
    ]
    out = {
        r["log_pos"]: r["auto_increment_id"]
        for r in with_auto_increment(
            spark.createDataFrame(rows, SCHEMA), pos_bucket_bytes=4
        ).collect()
    }
    assert out == {0: None, 1: 100, 7: None, 8: 200, 17: None, 33: None}
