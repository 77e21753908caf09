"""CDC → training-corpus bridge: incrementally sync a PagesTable (the
CDC replay target) into a CorpusTable (the deduplicated training
corpus), so a crawl's change stream MAINTAINS the corpus instead of
periodic full rebuilds — the end-to-end shape of a web-scale training
data pipeline (binlog tail → lake table → deduped corpus).

Mechanics per sync step:

- ``v0`` = the pages-table version of the LAST completed sync, recovered
  from the corpus's own commit ledger (the ingest batch id encodes the
  version range, ``pages-v{v0}-{v1}``) — exactly-once needs no sidecar
  state, and a crashed sync resumes by re-deriving the same range.
- ``changes_between(v0, v1)`` (the Iceberg-style incremental read)
  supplies the NET delta: D and U urls are FORGOTTEN from the corpus
  first (deleted or re-crawled content must leave a living training set
  — right-to-be-forgotten and retraining freshness in one op), then
  I/U rows re-enter through the corpus's dedup gate. Forgetting before
  re-ingest means a re-crawl is never rejected as a near-dup of its own
  stale version.
- doc ids are ``xxhash64(url)`` — deterministic, so forget and
  re-ingest address the same id across syncs (collision odds ~n²/2⁶⁴).

Crash safety: forget and ingest are two separately-ledgered corpus
commits under the same version range. A crash between them re-runs the
sync with the SAME v0 (only ingest ids advance it): the forget
re-delivers as a ledger no-op and ingest proceeds. If the pages table
advanced meanwhile, the wider range's forget is a superset — removal is
idempotent.

Scale: each step touches O(changed keys) — the changelog join is the
pages table's own incremental read, the forget set broadcasts, and the
ingest pays the band-index equi-join, never O(corpus).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sink.corpus_table import CorpusTable
from ..sink.pages_table import PagesTable

_SYNC_RE = re.compile(r"^pages-v(\d+)-(\d+)$")


def last_synced_version(corpus: CorpusTable) -> int | None:
    """Highest pages-table version a completed ingest covered, from the
    corpus ledger itself."""
    vs = [
        int(g.group(2))
        for b in corpus.manifest().committed_batches
        if (g := _SYNC_RE.match(b))
    ]
    return max(vs, default=None)


def doc_id_col(key_col: str = "url"):
    """The deterministic url → doc_id mapping both sync phases share."""
    return F.xxhash64(key_col)


def sync_corpus(
    spark: SparkSession,
    pages: PagesTable,
    corpus: CorpusTable,
    text_col: str = "text",
) -> dict:
    """One incremental sync step: pages changes since the last sync →
    forget (D/U urls) → dedup-gated ingest (I/U rows). Idempotent: both
    phases are ledgered under the version range, so re-running after any
    crash converges."""
    m = corpus.manifest()
    v1 = pages.manifest().version
    v0 = last_synced_version(corpus)
    if v0 == v1:
        return {"skipped": True, "version": v1}

    key = pages.manifest().key_columns[0]
    if v0 is None:
        # initial load: the live view is the changelog from nothing
        live = pages.read()
        changed = live.select(
            F.col(key), F.lit("I").alias("change_op"), F.col(text_col)
        )
        range_id = f"pages-v0-{v1}"
    else:
        ch = pages.changes_between(v0, v1, with_before=True)
        # rank-only updates (re-crawl with byte-identical text) are
        # corpus no-ops: neither forgotten nor re-gated
        rank_only = (F.col("change_op") == "U") & F.col(text_col).eqNullSafe(
            F.col(f"before_{text_col}")
        )
        changed = ch.where(~rank_only).select(key, "change_op", text_col)
        range_id = f"pages-v{v0}-{v1}"
        # D: content left the table. U: stale content — forget, then the
        # new version re-enters through the gate below.
        forget_ids = (
            changed.where(F.col("change_op").isin("D", "U"))
            .select(doc_id_col(key).alias(m.id_col))
            .distinct()
        )
        corpus.forget(f"forget-{range_id}", forget_ids)

    docs = (
        changed.where(F.col("change_op") != "D")
        .where(F.col(text_col).isNotNull())
        .select(
            doc_id_col(key).alias(m.id_col),
            F.col(text_col).alias(m.text_col),
        )
    )
    res = corpus.apply_batch(range_id, docs)
    return {
        "skipped": False,
        "from_version": v0,
        "to_version": v1,
        "ingest": res,
    }
