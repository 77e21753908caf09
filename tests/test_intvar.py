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
