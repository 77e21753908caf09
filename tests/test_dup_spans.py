"""Exact duplicated-substring span dedup (Lee et al. 2022 shape):
semantic invariants on a crafted corpus + full DuckDB oracle parity for
the per-doc census over the real sf documents table."""

import duckdb
import pyspark.sql.functions as F

from mysql_syncer_spark.functions.dedup_text import (
    duplicated_span_stats,
    duplicated_spans,
    strip_duplicated_spans,
)

BOILER = (
    "subscribe to our newsletter for the latest updates and offers from our site"
)
DOCS = [
    (0, "alpha unique content here. " + BOILER + " tail zero."),
    (1, "beta other words entirely. " + BOILER + " tail one extra."),
    # same boilerplate at a DIFFERENT offset and twice — catches the
    # alignment failure a position-stride sampler has by construction
    (2, BOILER + " " + BOILER),
    (3, "totally original text with no repetition whatsoever in it at all, none."),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_keeper_keeps_copy_and_others_flagged(spark):
    stats = {
        r["doc_id"]: r
        for r in duplicated_span_stats(_docs(spark), width=30).collect()
    }
    assert stats[0]["n_dup_spans"] == 0  # keeper (min doc_id per fp)
    assert stats[3]["n_dup_spans"] == 0  # unique doc
    assert stats[1]["dup_chars"] >= len(BOILER)
    # alignment-free: doc 2 holds the run at offsets 0 and len+1, neither
    # aligned with doc 0's offset — both copies must still be found
    assert stats[2]["n_dup_spans"] == 2
    assert stats[2]["dup_fraction"] > 0.8


def test_strip_removes_shared_run_only_from_non_keepers(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(_docs(spark), width=30).collect()
    }
    assert BOILER in out[0]  # keeper untouched
    assert BOILER not in out[1] and BOILER not in out[2]
    assert out[3] == DOCS[3][1]  # unique doc byte-identical (already normalized)
    # stripped text is a subsequence of segments of the original: the
    # non-removed head survives verbatim
    assert out[1].startswith("beta other words entirely")


def test_spans_are_merged_and_disjoint(spark):
    spans = duplicated_spans(_docs(spark), width=30).orderBy(
        "doc_id", "span_start"
    ).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for ivs in by_doc.values():
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert e1 < s2, "merged spans must be disjoint and non-adjacent"
        assert all(e > s for s, e in ivs)


def _oracle_stats_sql(width: int, k: int, p: int) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS txt
  FROM docs
),
eligible AS (
  SELECT doc_id, txt, length(txt) AS len FROM base WHERE length(txt) >= {width}
),
cand AS (
  SELECT doc_id, txt, unnest(range(0, len - {width} + 1)) AS pos FROM eligible
),
sel AS (
  SELECT doc_id, pos, md5(substr(txt, pos + 1, {width})) AS fp
  FROM cand
  WHERE ('0x' || substr(md5(substr(txt, pos + 1, {k})), 1, 8))::BIGINT % {p} = 0
),
per_fp AS (
  SELECT fp, min(doc_id) AS keeper
  FROM sel GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
),
removable AS (
  SELECT DISTINCT s.doc_id, s.pos, s.pos + {width} AS e
  FROM sel s JOIN per_fp p USING (fp) WHERE s.doc_id <> p.keeper
),
islands AS (
  SELECT doc_id, pos, e,
    CASE WHEN pos > coalesce(max(e) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
    THEN 1 ELSE 0 END AS ni
  FROM removable
),
isl2 AS (
  SELECT doc_id, pos, e,
    sum(ni) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
      AS island
  FROM islands
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(e) AS e FROM isl2 GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, count(*) AS n_dup_spans, sum(e - s) AS dup_chars
  FROM spans GROUP BY doc_id
)
SELECT b.doc_id,
       coalesce(n_dup_spans, 0) AS n_dup_spans,
       coalesce(dup_chars, 0) AS dup_chars,
       length(b.txt) AS doc_chars,
       round(coalesce(dup_chars, 0) / greatest(length(b.txt), 1), 9)
         AS dup_fraction
FROM base b LEFT JOIN per_doc USING (doc_id)
ORDER BY doc_id
"""


def test_span_stats_duckdb_oracle_parity(spark, sf_dir):
    width, k, p = 40, 8, 8
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = {
        r["doc_id"]: (
            r["n_dup_spans"], r["dup_chars"], r["doc_chars"],
            round(float(r["dup_fraction"]), 9),
        )
        for r in duplicated_span_stats(
            docs, width=width, anchor_k=k, anchor_mod=p
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        row[0]: (row[1], row[2], row[3], round(float(row[4]), 9))
        for row in con.execute(_oracle_stats_sql(width, k, p)).fetchall()
    }
    assert len(got) == len(want) == 500
    assert got == want
    # sanity: the corpus is known to carry near-dups — spans must fire
    assert sum(1 for v in got.values() if v[0] > 0) > 0


def test_planted_duplicates_randomized(spark):
    """Seeded random corpus with PLANTED shared runs at arbitrary
    offsets: every planted copy in a non-keeper doc must be detected
    (run length 240 >> width → anchor-miss probability ~(7/8)^200,
    negligible; the seed pins the corpus so this is deterministic)."""
    import random

    rng = random.Random(1234)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    planted = "".join(rng.choice(alpha) for _ in range(240))
    rows = []
    has_plant = set()
    for i in range(30):
        body = "".join(rng.choice(alpha) for _ in range(rng.randint(150, 600)))
        if i % 3 == 0:
            cut = rng.randint(0, len(body))
            body = body[:cut] + planted + body[cut:]
            has_plant.add(i)
        rows.append((i, body))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r["doc_id"]: r
        for r in duplicated_span_stats(df, width=50).collect()
    }
    keeper = min(has_plant)
    for i in sorted(has_plant):
        if i == keeper:
            continue
        assert stats[i]["dup_chars"] >= 150, (i, stats[i])
    # the keeper and the plant-free docs stay clean (random 50-char
    # collisions across 26-letter strings don't happen)
    assert stats[keeper]["n_dup_spans"] == 0
    for i in set(range(30)) - has_plant:
        assert stats[i]["n_dup_spans"] == 0, i


def test_strip_spans_duckdb_parity(spark, sf_dir):
    """Byte-level parity for the JVM-fold strip: DuckDB rebuilds each
    doc's stripped text as the ordered concatenation of the segments
    between removable intervals (lag-window segmentation), and the md5
    of every doc's stripped text must match Spark's."""
    width, k, p = 40, 8, 8
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(
            docs, width=width, anchor_k=k, anchor_mod=p
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    spans_cte = _oracle_stats_sql(width, k, p).split("per_doc AS")[0]
    rows = con.execute(spans_cte + """
segs AS (
  SELECT doc_id, s, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS seg_start,
         max(e) OVER (PARTITION BY doc_id) AS last_e
  FROM spans
),
rebuilt AS (
  SELECT g.doc_id,
         string_agg(substr(b.txt, g.seg_start + 1, g.s - g.seg_start), ''
                    ORDER BY g.s)
           || substr(b.txt, max(g.last_e) + 1) AS stripped
  FROM segs g JOIN base b USING (doc_id)
  GROUP BY g.doc_id, b.txt
)
SELECT b.doc_id, coalesce(r.stripped, b.txt) AS stripped
FROM base b LEFT JOIN rebuilt r USING (doc_id)
""").fetchall()
    want = {row[0]: row[1] for row in rows}
    assert set(got) == set(want)
    mismatches = [i for i in got if got[i] != want[i]]
    assert mismatches == [], mismatches[:5]
