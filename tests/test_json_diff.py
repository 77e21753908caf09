"""MySQL 8.0 partial JSON updates (sources/json_diff.py +
PARTIAL_UPDATE_ROWS_EVENT framing in mysql_rows.py): path parsing,
diff apply semantics, binary diff stream round-trip, and the full wire
pairing where after-image JSON arrives as diffs applied onto the
before-image document."""

import json

import pytest

from mysql_syncer_spark.sources.json_diff import (
    DIFF_INSERT,
    DIFF_REMOVE,
    DIFF_REPLACE,
    JsonDiffError,
    JsonDiffs,
    apply_json_diffs,
    decode_json_diffs,
    encode_json_diffs,
    parse_json_path,
)
from mysql_syncer_spark.sources.mysql_rows import MySQLColumn, MySQLTableDef

# ---------------------------------------------------------------------------
# paths
# ---------------------------------------------------------------------------


def test_parse_json_path_legs():
    assert parse_json_path("$") == []
    assert parse_json_path("$.a") == ["a"]
    assert parse_json_path("$.a.b[3]") == ["a", "b", 3]
    assert parse_json_path('$."a b"[0].c') == ["a b", 0, "c"]
    assert parse_json_path('$."with \\"quote"') == ['with "quote']


def test_parse_json_path_rejects_garbage():
    for bad in ("a.b", "$.", "$[x]", "$.a..b", "$.*"):
        with pytest.raises(JsonDiffError):
            parse_json_path(bad)


# ---------------------------------------------------------------------------
# apply semantics
# ---------------------------------------------------------------------------


def test_apply_replace_insert_remove():
    doc = {"a": {"b": [1, 2, 3]}, "keep": True}
    out = apply_json_diffs(doc, [
        (DIFF_REPLACE, "$.a.b[1]", 99),
        (DIFF_INSERT, "$.a.b[0]", 0),
        (DIFF_REMOVE, "$.a.b[3]", None),
        (DIFF_INSERT, "$.c", "new"),
        (DIFF_REMOVE, "$.keep", None),
    ])
    assert out == {"a": {"b": [0, 1, 99]}, "c": "new"}
    # original untouched
    assert doc == {"a": {"b": [1, 2, 3]}, "keep": True}


def test_apply_root_replace_and_array_append():
    assert apply_json_diffs({"x": 1}, [(DIFF_REPLACE, "$", [1])]) == [1]
    assert apply_json_diffs([1], [(DIFF_INSERT, "$[1]", 2)]) == [1, 2]


def test_apply_errors_mirror_mysql_cannot_apply():
    with pytest.raises(JsonDiffError):
        apply_json_diffs({}, [(DIFF_REPLACE, "$.missing", 1)])
    with pytest.raises(JsonDiffError):
        apply_json_diffs({"a": 1}, [(DIFF_INSERT, "$.a", 2)])
    with pytest.raises(JsonDiffError):
        apply_json_diffs({"a": []}, [(DIFF_REMOVE, "$.a[0]", None)])
    with pytest.raises(JsonDiffError):
        apply_json_diffs({"a": 1}, [(DIFF_REPLACE, "$.a.b", 1)])


# ---------------------------------------------------------------------------
# binary stream
# ---------------------------------------------------------------------------


def test_diff_stream_round_trip():
    diffs = [
        (DIFF_REPLACE, "$.a.b[1]", {"k": [1, None, "s"]}),
        (DIFF_REMOVE, '$."long path ' + "x" * 300 + '"', None),
        (DIFF_INSERT, "$.c", 2.5),
    ]
    blob = encode_json_diffs(diffs)
    assert decode_json_diffs(blob) == diffs


def test_diff_stream_known_bytes():
    # REMOVE $.a → op=2, pathlen=3 (packed 1B), "$.a"
    assert encode_json_diffs([(DIFF_REMOVE, "$.a", None)]) == b"\x02\x03$.a"


# ---------------------------------------------------------------------------
# PARTIAL_UPDATE_ROWS_EVENT framing
# ---------------------------------------------------------------------------

TD = MySQLTableDef(
    columns=(
        MySQLColumn("id", "long"),
        MySQLColumn("attrs", "json"),
        MySQLColumn("name", "varchar(40)"),
        MySQLColumn("prefs", "json"),
    )
)


def test_partial_update_rows_event_applies_diffs():
    before = {
        "id": 7,
        "attrs": {"tags": ["a", "b"], "score": 5},
        "name": "row7",
        "prefs": {"theme": "dark"},
    }
    after = {
        "id": 7,
        "attrs": JsonDiffs([
            (DIFF_REPLACE, "$.score", 6),
            (DIFF_INSERT, "$.tags[2]", "c"),
        ]),
        "name": "row7",
        "prefs": {"theme": "light"},  # full doc: partial bit stays 0
    }
    blob = TD.encode_rows_event([(before, after)], "update_partial")
    (pair,) = TD.decode_rows_event(blob, "update_partial")
    assert json.loads(pair["before_attrs"]) == before["attrs"]
    assert json.loads(pair["after_attrs"]) == {
        "tags": ["a", "b", "c"], "score": 6,
    }
    assert json.loads(pair["after_prefs"]) == {"theme": "light"}
    assert pair["after_name"] == "row7"


def test_partial_update_shrinks_wire_bytes():
    big = {"blob": "x" * 5000, "n": 1}
    before = {"id": 1, "attrs": big, "name": "r", "prefs": None}
    full_after = dict(before, attrs=dict(big, n=2))
    part_after = dict(before, attrs=JsonDiffs([(DIFF_REPLACE, "$.n", 2)]))
    full = TD.encode_rows_event([(before, full_after)], "update")
    part = TD.encode_rows_event([(before, part_after)], "update_partial")
    assert len(part) < len(full) - 4000  # diff rides, document doesn't


def test_partial_without_before_doc_raises():
    before = {"id": 1, "attrs": None, "name": "r", "prefs": None}
    after = dict(before, attrs=JsonDiffs([(DIFF_REPLACE, "$.n", 2)]))
    blob = TD.encode_rows_event([(before, after)], "update_partial")
    with pytest.raises(JsonDiffError):
        TD.decode_rows_event(blob, "update_partial")


def test_multi_row_partial_event():
    rows = []
    for i in range(10):
        before = {"id": i, "attrs": {"n": i, "l": list(range(i % 4))},
                  "name": f"r{i}", "prefs": None}
        if i % 2:
            after = dict(before, attrs=JsonDiffs([
                (DIFF_REPLACE, "$.n", i * 10),
            ]))
        else:
            after = dict(before, attrs={"replaced": i})
        rows.append((before, after))
    blob = TD.encode_rows_event(rows, "update_partial")
    out = TD.decode_rows_event(blob, "update_partial")
    assert len(out) == 10
    for i, pair in enumerate(out):
        got = json.loads(pair["after_attrs"])
        if i % 2:
            assert got == {"n": i * 10, "l": list(range(i % 4))}
        else:
            assert got == {"replaced": i}


def test_decode_mysql_updates_distributed(spark):
    """decode_mysql_updates: Arrow-batched UPDATE pairing with the
    PARTIAL_JSON after-image prefix — diffs folded executor-side."""
    from mysql_syncer_spark.sources.mysql_rows import decode_mysql_updates

    rows = []
    for i in range(40):
        before = {"id": i, "attrs": {"n": i, "l": [i, i + 1]},
                  "name": f"r{i}", "prefs": None}
        after = dict(before, attrs=JsonDiffs([
            (DIFF_REPLACE, "$.n", i * 10),
            (DIFF_REPLACE, "$.l[0]", -i),
        ]), name=f"r{i}!")
        rows.append((before, after))
    blobs = [
        (k, TD.encode_rows_event(rows[k * 10:(k + 1) * 10], "update_partial"))
        for k in range(4)
    ]
    df = spark.createDataFrame(blobs, "event_seq long, rows_event binary")
    out = decode_mysql_updates(
        df, TD, keep_cols=("event_seq",), partial=True
    ).orderBy("after_id").collect()
    assert len(out) == 40
    for i, r in enumerate(out):
        assert r["event_seq"] == i // 10
        assert r["before_name"] == f"r{i}"
        assert r["after_name"] == f"r{i}!"
        assert json.loads(r["after_attrs"]) == {"n": i * 10, "l": [-i, i + 1]}
