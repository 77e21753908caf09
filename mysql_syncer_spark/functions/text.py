"""Text extraction / normalization / analysis over web-page payloads.

Extraction determinism contract (BASELINE.json input_hint): ``text`` must be
byte-identical per url between the engine's vectorized UDF and the oracle's
pure-Python fold. Both paths therefore share ONE pure function over bytes
(``extract_text_bytes``) with no locale-, version-, or library-dependent
behavior — ASCII-regex tag stripping + whitespace collapse + HTML entity
subset, nothing else.

Two engine implementations are provided:
- ``with_extracted_text(df, impl='pandas')`` — Arrow-batched pandas UDF
  (the input_hint-mandated path; pandas str ops, no per-row Python loop).
- ``impl='sql'`` — pure JVM regexp_replace chain (whole-stage codegen,
  fastest; used to cross-check the UDF in tests).

The analysis helpers (language ID, quality score, token count,
fingerprint) are JVM built-ins end-to-end — these run in the 100 TB hot
path and must stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
# Fixed entity subset — deliberately tiny and version-independent.
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')]
_TAG_PAT = r"<[^>]*>"
_WS_PAT = r"\s+"


def extract_text_bytes(html: bytes) -> str:
    """Pure deterministic html→text. THE spec — oracle and UDF both call
    this logic (the UDF re-expresses it with vectorized pandas str ops)."""
    s = html.decode("utf-8", errors="replace")
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction: vectorized pandas string ops over the whole
    batch (no per-row Python function calls)."""
    s = html.str.decode("utf-8", errors="replace")
    s = s.str.replace(_TAG_PAT, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS_PAT, " ", regex=True).str.strip()


def extract_text_sql(html: Column) -> Column:
    """JVM-side equivalent (regexp_replace chain; whole-stage codegen)."""
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _TAG_PAT, " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _WS_PAT, " "))


@pandas_udf(T.StringType())
def fill_text_udf(html: pd.Series, text: pd.Series) -> pd.Series:
    """Extraction that fills ONLY missing text (merge winners coming from
    the change stream); rows that already carry text (current-state
    winners, tombstones) pass through untouched — so post-merge extraction
    costs scale with newly-won rows, not table rows."""
    need = text.isna() & html.notna()
    if not need.any():
        return text
    s = html[need].str.decode("utf-8", errors="replace")
    s = s.str.replace(_TAG_PAT, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_WS_PAT, " ", regex=True).str.strip()
    out = text.copy()
    out[need] = s
    return out


def with_filled_text(
    df: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    return df.withColumn(text_col, fill_text_udf(F.col(html_col), F.col(text_col)))


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text", impl: str = "pandas"
) -> DataFrame:
    if impl == "pandas":
        col = extract_text_udf(F.col(html_col))
    elif impl == "sql":
        col = extract_text_sql(F.col(html_col))
    else:
        raise ValueError(f"impl must be pandas|sql, got {impl}")
    return df.withColumn(
        out_col, F.when(F.col(html_col).isNotNull(), col).otherwise(F.lit(None))
    )


# ---------------------------------------------------------------------------
# Text analysis (documents table / extracted text) — all JVM built-ins.
# ---------------------------------------------------------------------------

TOKEN_PAT = r"\s+"

# Tiny fixed marker-word lists for the n-gram-free heuristic language ID.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|is|and|of)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}


def token_count(text: Column) -> Column:
    """Whitespace token count, empty/NULL-safe."""
    trimmed = F.trim(text)
    return F.when(
        trimmed.isNull() | (trimmed == ""), F.lit(0)
    ).otherwise(F.size(F.split(trimmed, TOKEN_PAT)))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: F.regexp_count(F.lower(text), F.lit(pat)) for lang, pat in LANG_MARKERS.items()}


# Fixed priority for tie-breaks — first listed wins a tie.
LANG_PRIORITY = ("en", "de", "fr", "es")


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hit counts; 'und' if no
    marker hits. Ties break by LANG_PRIORITY order — a plain comparison
    cascade so the DuckDB oracle can mirror it verbatim."""
    s = lang_scores(text)
    top = F.greatest(*[s[lang] for lang in LANG_PRIORITY])
    pick = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        pick = F.when(s[lang] == top, F.lit(lang)).otherwise(pick)
    return F.when(top > 0, pick).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features (web-corpus quality
    scoring). All exact-arithmetic per row (no aggregation FP ambiguity)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    stop_hits = F.regexp_count(F.lower(text), F.lit(r"\b(the|a|of|and|is)\b"))
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "stop_hits": stop_hits,
        "punct_hits": punct,
        "stop_ratio": F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 4),
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 4),
        "avg_token_len": F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4),
    }


# GPT2-ish pre-tokenizer: contraction suffixes, letter runs, digit runs,
# punctuation runs (space-prefixed). Works identically under Java regex and
# RE2 (no lookaheads used).
BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count (subword-boundary approximation for LLM-corpus
    budgeting) — one JVM regexp_count, no Python."""
    return F.regexp_count(text, F.lit(BPE_PAT))


_RH_MOD = 1_000_000_007
_RH_MUL = 1_000_003


def rolling_fingerprint(text: Column) -> Column:
    """Karp-Rabin-style rolling hash over the whitespace token stream:
    fold acc = (acc*MUL + h(token)) mod P with h = len*96769 + ascii(first).
    Order-sensitive (unlike a bag-of-words md5), pure int64 arithmetic in
    a higher-order fold — engine-portable and collision-checkable."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    toks = F.split(norm, " ")
    hashes = F.transform(
        toks,
        lambda t: (F.length(t) * F.lit(96769) + F.ascii(t)).cast("long") % _RH_MOD,
    )
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * _RH_MUL + h) % _RH_MOD,
    )


# PII scrubbing patterns — fixed, version-independent ASCII regexes that
# behave identically under Java regex and RE2/DuckDB (no lookarounds).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def redact_pii(text: Column) -> Column:
    """Training-corpus PII scrubbing: emails / phone-shaped / SSN-shaped
    spans replaced with typed placeholders. Pure JVM regexp_replace chain
    (whole-stage codegen) — the 100 TB hot path needs no Python here."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def vocabulary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """Corpus vocabulary: total occurrence count per whitespace token,
    top-k by (count desc, token asc). Explode multiplies rows, but count
    partial-combines map-side so the shuffle carries one row per (mapper,
    token); the top-k itself is ``orderBy(...).limit(k)`` — a TakeOrdered
    physical op (per-partition heaps, no global sort, no single-partition
    window over the whole vocabulary). Rank is then derived by a window
    over the ALREADY k-limited result (≤ k rows — driver-trivial).
    Output: token, n_occurrences, rank."""
    toks = df.select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    topk = counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(top_k)
    from pyspark.sql import Window

    return topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n_occurrences"), F.asc("token"))),
    )


def unigram_nll(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-relative unigram negative log-likelihood per document — the
    CCNet-style LM quality proxy with the corpus itself as the model:
    nll = ln(total_tokens) - avg over the doc's token OCCURRENCES of
    ln(count(token)). Low = built from common tokens (typical text);
    high = rare-token salad. The usual pipeline drops the tails of the
    nll distribution (boilerplate at the bottom, garbage at the top).

    Shape: two partial-agg'd shuffles (vocab count; per-doc avg) and one
    equi-join on token. The join's hot keys ('the') are exactly the skew
    AQE's skew-join split handles, and Spark broadcasts the vocab side
    outright when it is small. The exploded token stream feeds both the
    vocab aggregate and the join, so it is lazily localCheckpoint-ed —
    at persistent scale you'd materialize the vocab table once per
    corpus snapshot instead.
    Output: id, n_tokens (occurrences), nll (rounded 4)."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .localCheckpoint(eager=False)
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    return (
        toks.join(vocab, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log("cnt")).alias("_avg_ln_cnt"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_tokens",
            F.round(F.log("total") - F.col("_avg_ln_cnt"), 4).alias("nll"),
        )
    )


def normalized_text(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over normalized text (lower + collapsed
    whitespace). Stable across engines (md5 of UTF-8 bytes)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style LINE repetition signals (Rae et al. 2021 §A1.1, the
    standard webtext quality gate): fraction of duplicate lines and
    fraction of characters inside duplicate lines. JVM higher-order array
    functions, projection-only (no shuffle); the per-row cost is
    O(lines²) which is bounded — web pages have tens to hundreds of
    lines, not thousands. Token-level n-gram mass lives in
    ``top_ngram_char_fraction`` (explode-based, linear) because gram
    counts DO reach the thousands per document."""
    lines = F.filter(F.split(text, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0, 1.0 - n_distinct_lines / n_lines
    ).otherwise(F.lit(0.0))
    dup_line_chars = F.aggregate(
        lines,
        F.lit(0),
        lambda acc, x: acc
        + F.when(
            F.size(F.filter(lines, lambda y: y == x)) > 1, F.length(x)
        ).otherwise(F.lit(0)),
    )
    total_line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    dup_line_char_frac = F.when(
        total_line_chars > 0, dup_line_chars / total_line_chars
    ).otherwise(F.lit(0.0))
    return {
        "dup_line_frac": F.round(dup_line_frac, 4),
        "dup_line_char_frac": F.round(dup_line_char_frac, 4),
    }


def _ngrams(text: Column, n: int) -> Column:
    toks = F.filter(F.split(F.lower(text), r"\W+"), lambda x: x != "")
    return F.when(F.size(toks) >= n, F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
    )).otherwise(F.array().cast("array<string>"))


def top_ngram_char_fraction(
    df, n: int, id_col: str = "doc_id", text_col: str = "text"
):
    """Character mass of each document's most frequent word n-gram
    (Gopher §A1.1 "top n-gram"): explode grams → count per (doc, gram) →
    max mass vs total. Linear in corpus size, ONE shuffle keyed by
    (doc, gram) with map-side partial counts — the scale-safe shape for
    documents with thousands of grams (an all-pairs array expression
    would be O(grams²) per row)."""
    grams = df.select(
        F.col(id_col), F.explode(_ngrams(F.col(text_col), n)).alias("_g")
    )
    per_gram = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    frac = (
        per_gram.groupBy(id_col)
        .agg(
            F.max(F.col("_c") * F.length("_g")).alias("_top_mass"),
            F.sum(F.col("_c") * F.length("_g")).alias("_total_mass"),
        )
        .select(
            F.col(id_col),
            F.round(F.col("_top_mass") / F.col("_total_mass"), 4).alias(
                f"top_{n}gram_char_frac"
            ),
        )
    )
    return frac


def with_repetition_features(df, id_col: str = "doc_id", text_col: str = "text"):
    """documents + dup-line fractions (inline) + top 2-gram / 3-gram char
    mass (two linear aggregations, left-joined back; docs with no grams
    get 0.0)."""
    out = df
    for name, col in repetition_features(F.col(text_col)).items():
        out = out.withColumn(name, col)
    for n in (2, 3):
        out = out.join(top_ngram_char_fraction(df, n, id_col, text_col),
                       on=id_col, how="left")
        out = out.fillna({f"top_{n}gram_char_frac": 0.0})
    return out


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Corpus inverted index: token -> (n_docs, postings) with postings a
    SORTED doc-id array — the retrieval-side artifact of a data platform
    (serve term lookups / AND-queries without scanning text).

    One explode + one groupBy (count and collect_list both partial-
    combine map-side; the sort is per-token over its own postings).
    ``max_df_frac`` drops stopword-grade tokens: a posting list for
    'the' IS the whole corpus — at 100 TB that row would be a multi-GB
    array in one reducer, so high-document-frequency tokens are capped
    out by a cheap post-aggregate filter (count first, list only kept
    rows via a second pass when the cap is active).
    Output: token, n_docs, postings."""
    from mysql_syncer_spark.functions.dedup_text import distinct_tokens

    toks = distinct_tokens(df, id_col, text_col)
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_docs"))
    if max_df_frac < 1.0:
        n_total = df.select(id_col).distinct().count()
        counts = counts.filter(F.col("n_docs") <= int(max_df_frac * n_total))
        toks = toks.join(F.broadcast(counts.select("token")), "token", "left_semi")
    lists = toks.groupBy("token").agg(
        F.sort_array(F.collect_list(id_col)).alias("postings")
    )
    return counts.join(lists, "token").select("token", "n_docs", "postings")


def search_all_terms(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """AND-query over the inverted index: doc ids containing EVERY term.
    Explodes only the queried terms' postings (index rows are fetched by
    an IN filter — partition-prunable when the index is written bucketed
    by token) and keeps ids seen len(terms) times. Never touches text."""
    n = len(set(terms))
    hits = (
        index.filter(F.col("token").isin(*set(terms)))
        .select(F.explode("postings").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == n)
        .select(id_col)
    )
    return hits


def doc_lengths(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, dl) — token count per doc under the index tokenizer (full
    counts, not set semantics). Computed map-side from the split array;
    no shuffle beyond the trivial projection."""
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda x: x != ""
    )
    return df.select(F.col(id_col), F.size(toks).alias("dl"))


def tf_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 1.0,
) -> DataFrame:
    """(token, doc_id, tf) — term-frequency postings, the ranked-retrieval
    index artifact (inverted_index keeps set semantics for AND-queries;
    BM25 needs tf). One explode + one groupBy(token, id) with map-side
    partial counts; write it bucketed by token so term fetches prune.
    ``max_df_frac`` caps stopword-grade tokens exactly as inverted_index
    does — a posting list for 'the' is the corpus itself at 100 TB."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(normalized_text(F.col(text_col)), " "), lambda x: x != ""
            )
        ).alias("token"),
    )
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    if max_df_frac < 1.0:
        n_total = df.select(id_col).distinct().count()
        keep = (
            tf.groupBy("token")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") <= int(max_df_frac * n_total))
            .select("token")
        )
        tf = tf.join(F.broadcast(keep), "token", "left_semi")
    return tf


def bm25_topk(
    postings: DataFrame,
    lens: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k over a persisted (token, doc_id, tf) postings table and
    a (doc_id, dl) length table — Robertson idf = ln(1 + (N-df+.5)/(df+.5)).

    Query-time plan: fetch ONLY the query terms' postings (an IN filter —
    partition-pruned when the postings table is bucketed/partitioned by
    token), derive per-term df from the fetched rows themselves (a tiny
    groupBy over |terms| keys, broadcast back), join doc lengths on id
    (one shuffle of the fetched postings, never the corpus), sum scores
    per doc, TakeOrdered k. N and avgdl are one-row aggregates
    cross-joined in-plan — no driver round-trip, no global sort.
    Output: doc_id, score (rounded to 9 for engine-portable comparison),
    ordered score desc then id."""
    qterms = sorted(set(terms))
    # lazily checkpoint the fetched postings: df derivation and scoring
    # both consume them, and when the caller composes postings in-memory
    # (tests) the corpus tokenize would otherwise run once per consumer.
    # Against a persisted postings table this is a few-row cache.
    fetched = postings.filter(F.col("token").isin(*qterms)).localCheckpoint(
        eager=False
    )
    dfreq = fetched.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_corpus"), F.avg("dl").alias("avgdl")
    )
    scored = (
        fetched.join(F.broadcast(dfreq), "token")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_corpus") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("w"), 9).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
