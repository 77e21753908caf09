"""One-call training-corpus build — the composition a corpus team runs.

Thin orchestration over individually-tested operators (each stage's
semantics and oracle live with its own module/tests):

  1. quality gate     text.quality_features + lang_id (map-only)
  2. exact dedup      md5-fingerprint window, keeper = lowest id
  3. near dedup       minhash LSH candidates verified by exact
                      token-set Jaccard (default; candidates-only with
                      near_dup_jaccard=None) → reject non-keepers
  3b. span strip      optional dedup_text.strip_duplicated_spans over the
                      survivors (Lee-et-al exact substring dedup: shared
                      boilerplate runs cut from non-keepers)
  3c. decontaminate   optional dedup_text.contaminated_docs against a
                      benchmark set (GPT-3-style 13-gram overlap) —
                      flagged docs are dropped before LM scoring
  4. LM scoring       text.unigram_nll over the SURVIVORS (the corpus-as-
                      LM should be fit on what you keep)
  5. quality buckets  mixture.quality_buckets_2pass per domain (map-only
                      label after a tiny cutoff aggregate)
  6. mixing           mixture.mixture_sample epoch rates per domain,
                      with optional per-bucket multipliers (head gets
                      upsampled, tail dropped — the CCNet recipe)
  7. split + packing  mixture.hash_split / pack_sequences

Everything is deterministic (md5-hex draws, rank windows), so the whole
build is reproducible run-to-run and engine-to-engine. Stage costs at
scale: two token-level shuffles (LSH signatures, nll vocab+doc agg), one
banded self-join, one cutoff aggregate; every other stage is map-only or
a 256-group window. Nothing is O(corpus²), nothing collects to the
driver beyond per-domain cutoffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_syncer_spark.functions.dedup_text import (
    contaminated_docs,
    lsh_candidate_pairs,
    minhash_signatures,
    strip_duplicated_spans,
    verified_near_duplicates,
)
from mysql_syncer_spark.functions.mixture import (
    hash_split,
    mixture_sample,
    pack_sequences,
    quality_buckets_2pass,
)
from mysql_syncer_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_features,
    unigram_nll,
)


def build_training_corpus(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    bucket_rate_mult: dict[str, float] | None = None,
    near_dup_jaccard: float | None = 0.5,
    strip_span_width: int | None = None,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
    holdout: float = 0.01,
    pack_budget: int = 2048,
    seed: str = "corpus1",
) -> DataFrame:
    """Returns one row per kept doc × split with its shard assignment:
    (id, domain, bucket, n_copies, split, pack_group, shard_idx,
    start_tok, n_tokens). ``bucket_rate_mult`` scales each domain's epoch
    rate by quality bucket, e.g. {'head': 1.5, 'middle': 1.0, 'tail': 0}
    — a 0 drops the bucket entirely. ``strip_span_width`` (e.g. 50) turns
    on exact duplicated-substring stripping over the dedup survivors:
    boilerplate runs shared across docs are CUT from every non-keeper
    before LM scoring and packing, so both see the cleaned text.
    ``benchmark`` (a DataFrame with a text column) turns on eval-set
    decontamination: any doc sharing a ``decontaminate_n``-gram with the
    benchmark is dropped entirely (broadcast semi-join — the corpus
    never shuffles for this stage)."""
    feats = quality_features(F.col(text_col))
    scored = docs.select(
        id_col,
        F.col(domain_col).alias("_domain"),
        F.col(text_col),
        fingerprint(F.col(text_col)).alias("_fp"),
        feats["n_tokens"].alias("_ntok"),
        feats["punct_ratio"].alias("_punct"),
        lang_id(F.col(text_col)).alias("_lang"),
    )
    w = Window.partitionBy("_fp").orderBy(id_col)
    kept = (
        scored.withColumn("_dup_rank", F.row_number().over(w))
        .filter(
            (F.col("_dup_rank") == 1)
            & (F.col("_ntok") >= min_tokens)
            & (F.col("_punct") <= max_punct_ratio)
            & F.col("_lang").isin(*langs)
        )
        .drop("_dup_rank", "_fp", "_ntok", "_punct", "_lang")
        .localCheckpoint(eager=False)
    )
    # near-dup pass over the exact-dedup survivors: keeper = smallest id
    # of each pair, same greedy rule as CorpusTable. With
    # ``near_dup_jaccard`` set (the default), candidacy alone does not
    # drop a doc — the pair must pass exact token-set Jaccard
    # (verified_near_duplicates: LSH candidates → verify join only).
    if near_dup_jaccard is not None:
        pairs = verified_near_duplicates(
            kept, id_col, text_col, threshold=near_dup_jaccard
        )
    else:
        pairs = lsh_candidate_pairs(
            minhash_signatures(kept, id_col, text_col), id_col
        )
    kept = kept.join(
        pairs.select(F.col("doc_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    ).localCheckpoint(eager=False)

    if strip_span_width is not None:
        stripped = strip_duplicated_spans(
            kept, id_col, text_col, width=strip_span_width
        )
        kept = (
            kept.drop(text_col)
            .join(stripped, id_col)
            .localCheckpoint(eager=False)
        )

    if benchmark is not None:
        flagged = contaminated_docs(
            kept, benchmark, n=decontaminate_n, id_col=id_col, text_col=text_col
        )
        kept = kept.join(
            flagged.select(id_col), id_col, "left_anti"
        ).localCheckpoint(eager=False)

    nll = unigram_nll(kept, id_col, text_col)
    bucketed = quality_buckets_2pass(
        nll.join(kept.select(id_col, "_domain"), id_col),
        "nll",
        by="_domain",
    )
    if rates is None:
        rates = {}
    mult = {"head": 1.0, "middle": 1.0, "tail": 1.0}
    mult.update(bucket_rate_mult or {})
    # effective per-(domain, bucket) rate — expressed as a rate on the
    # concatenated key so mixture_sample stays one map-only pass
    eff_rates = {
        f"{d}|{b}": r * m
        for d, r in rates.items()
        for b, m in mult.items()
    }
    keyed = bucketed.withColumn(
        "_mix_key", F.concat_ws("|", "_domain", "bucket")
    )
    mixed = mixture_sample(
        keyed,
        eff_rates,
        domain_col="_mix_key",
        id_col=id_col,
        seed=seed,
        default_rate=0.0 if rates else 1.0,
    ).drop("_mix_key")
    split = hash_split(mixed, holdout, id_col=id_col, seed=seed + "|split")
    packed = pack_sequences(
        kept.join(split.select(id_col), id_col, "left_semi"),
        budget=pack_budget,
        id_col=id_col,
        text_col=text_col,
        seed=seed + "|pack",
    )
    return (
        split.select(
            id_col,
            F.col("_domain").alias("domain"),
            "bucket",
            "n_copies",
            "split",
        )
        .join(packed, id_col)
    )


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_jaccard: float | None = None,
    span_width: int | None = None,
) -> DataFrame:
    """One-call corpus census: (metric, value) rows — the numbers a
    corpus team reads BEFORE deciding build_training_corpus knobs.

    Base pass (always): one partial-agg'd aggregate for doc/char/token
    totals + exact-duplicate mass (distinct content fingerprints), plus
    a tiny per-language count. Optional passes, each individually
    scale-safe: verified near-dup census (LSH + exact-Jaccard verify)
    and exact substring-span duplication (content-defined anchors).
    Output values are doubles; counts are exact, fractions in [0, 1]."""
    from mysql_syncer_spark.functions.dedup_text import (
        duplicated_span_stats,
        verified_near_duplicates,
    )
    from mysql_syncer_spark.functions.text import normalized_text, token_count

    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col),
        F.length(normalized_text(F.col(text_col))).alias("_chars"),
        token_count(F.col(text_col)).alias("_toks"),
        fingerprint(F.col(text_col)).alias("_fp"),
        lang_id(F.col(text_col)).alias("_lang"),
    ).localCheckpoint(eager=False)
    agg = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_chars").alias("total_chars"),
        F.sum("_toks").alias("total_tokens"),
        F.avg("_toks").alias("avg_tokens"),
        F.countDistinct("_fp").alias("n_distinct"),
    ).head()
    n_docs = int(agg["n_docs"]) or 1
    rows = [
        ("n_docs", float(agg["n_docs"])),
        ("total_chars", float(agg["total_chars"] or 0)),
        ("total_tokens", float(agg["total_tokens"] or 0)),
        ("avg_tokens", float(agg["avg_tokens"] or 0.0)),
        ("exact_dup_docs", float(agg["n_docs"] - agg["n_distinct"])),
        ("exact_dup_frac", (agg["n_docs"] - agg["n_distinct"]) / n_docs),
    ]
    for r in base.groupBy("_lang").count().collect():
        rows.append((f"lang_{r['_lang']}", float(r["count"])))
    if near_dup_jaccard is not None:
        nd = (
            verified_near_duplicates(
                docs, id_col, text_col, threshold=near_dup_jaccard
            )
            .select("doc_b")
            .distinct()
            .count()
        )
        rows.append(("near_dup_docs", float(nd)))
        rows.append(("near_dup_frac", nd / n_docs))
    if span_width is not None:
        sp = duplicated_span_stats(docs, id_col, text_col, width=span_width).agg(
            F.sum("dup_chars").alias("d"), F.sum("doc_chars").alias("t")
        ).head()
        rows.append(("span_dup_chars", float(sp["d"] or 0)))
        rows.append(
            ("span_dup_char_frac", (sp["d"] or 0) / max(int(sp["t"] or 0), 1))
        )
    return spark.createDataFrame(
        [(m, round(float(v), 9)) for m, v in rows], "metric string, value double"
    )
