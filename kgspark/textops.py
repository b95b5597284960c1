"""Text-analysis operators for large-scale training-data pipelines.

All pure column expressions (whole-stage codegen, no UDFs), each with an
exactly mirrorable ANSI-SQL formulation for the DuckDB oracle:

- tokenization (whitespace) and BPE-ish regex token counting;
- language identification (marker-word counting, deterministic argmax);
- quality scoring (length / stopword / punctuation signals);
- document fingerprinting (md5 over whitespace-normalized lowercase text).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from kgspark.synth import EN_STOPWORDS, LANG_MARKERS

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def tokens(col: Column) -> Column:
    return F.split(col, r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BPE_PATTERN))


def _word_set_count(col: Column, words: list[str]) -> Column:
    """How many whitespace tokens of ``col`` equal one of ``words``.

    Tokens are maximal ``\\s+``-separated runs, so "token == w" is exactly
    "occurrence of w bounded by whitespace or string edge" for the
    single-word entries in our marker/stopword lists — one codegen
    regexp_count instead of an interpreted filter(array_contains) pass
    over the token array (higher-order functions are CodegenFallback).
    Words are regex-quoted; any entry containing whitespace would break
    the token equivalence and is rejected loudly.
    """
    import re as _re

    for w in words:
        if _re.search(r"\s", w) or not w:
            raise ValueError(f"word-set entries must be single words: {w!r}")
    alt = "|".join(sorted((_re.escape(w) for w in words), key=len, reverse=True))
    return F.regexp_count(col, F.lit(rf"(?<=\s|^)(?:{alt})(?=\s|$)"))


def _marker_count(col: Column, markers: list[str]) -> Column:
    return _word_set_count(F.lower(col), markers)


def lang_id(col: Column, marker_sets: dict[str, list[str]] | None = None) -> Column:
    """Marker-word argmax with deterministic preference order.

    The reference keys behavior on a user-supplied ``language`` and ships
    per-language stopword lists (R/dbpedia.R:684-685,1385-1399); at crawl
    scale the language must be inferred. Ties break toward the earlier
    entry in the marker dict (en first)."""
    marker_sets = marker_sets or LANG_MARKERS
    counts = {lang: _marker_count(col, ms) for lang, ms in marker_sets.items()}
    m = F.greatest(*counts.values())
    best = F.lit("und")
    for lang in reversed(list(marker_sets)):
        best = F.when(counts[lang] == m, F.lit(lang)).otherwise(best)
    return F.when(m == 0, F.lit("und")).otherwise(best)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    n = F.size(tokens(F.lower(col)))
    n_sw = _word_set_count(F.lower(col), stopwords or EN_STOPWORDS)
    return F.when(n > 0, n_sw / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    n_punct = F.length(F.regexp_replace(col, "[A-Za-z0-9 \\t\\n]", ""))
    return F.when(n > 0, n_punct / n).otherwise(F.lit(0.0))


def quality_score(col: Column, stopwords: list[str] | None = None) -> Column:
    """Deterministic [0,1] quality heuristic (length + stopword + punct).

    score = 0.4*min(1, n_tokens/100) + 0.3*stopword_ratio + 0.3*(1-punct_ratio)
    rounded to 6 decimals (cross-engine float stability)."""
    n = token_count(col).cast("double")
    s = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * stopword_ratio(col, stopwords)
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
    )
    return F.round(s, 6)


def fingerprint(col: Column) -> Column:
    """Rolling content fingerprint: md5 of lowercased, whitespace-collapsed
    text. Stable across engines (md5 is bit-identical everywhere)."""
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", " ")))


# ---------------------------------------------------------------------------
# PII scrubbing — crawl-scale redaction before training-data materialization.
# Patterns are deliberately restricted to syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_PATTERN = r"\+?[0-9][0-9()\- ]{6,14}[0-9]"


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) BEFORE redaction, in scrub order."""
    n_email = F.regexp_count(col, F.lit(EMAIL_PATTERN))
    after_email = F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>")
    n_ip = F.regexp_count(after_email, F.lit(IPV4_PATTERN))
    after_ip = F.regexp_replace(after_email, IPV4_PATTERN, "<IP>")
    n_phone = F.regexp_count(after_ip, F.lit(PHONE_PATTERN))
    return n_email, n_ip, n_phone


def pii_scrub(col: Column) -> Column:
    """Redact emails -> IPv4s -> phones (that order: an IP's digit runs must
    not be half-eaten by the looser phone pattern). Pure regexp_replace
    chain — whole-stage codegen, no UDF, no shuffle."""
    out = F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_PATTERN, "<IP>")
    return F.regexp_replace(out, PHONE_PATTERN, "<PHONE>")


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality statistics (Rae et al. 2021, table A1):
# duplicate-line fraction, duplicate-word fraction, mean word length,
# symbol-to-word ratio, and the keep flag combining them. All pure array
# expressions; the keep flag is derived from the ROUNDED statistics so the
# boolean cannot diverge from the oracle on float ulps at a threshold.
def _nonempty(arr: Column) -> Column:
    return F.filter(arr, lambda x: F.length(x) > 0)


def repetition_stats(col: Column) -> dict[str, Column]:
    # codegen formulation (the filter/aggregate higher-order functions of
    # the original are CodegenFallback — interpreted per row):
    # - count of non-empty tokens/lines = count of maximal non-separator
    #   runs (one regexp_count each);
    # - distinct non-empty count = distinct over the raw split minus the
    #   one empty-string entry the split can contribute;
    # - total token length = chars remaining after deleting every
    #   whitespace char.
    raw_lines = F.split(col, "\n")
    raw_toks = F.split(col, r"\s+")
    n_lines = F.regexp_count(col, F.lit(r"[^\n]+"))
    n_words = F.regexp_count(col, F.lit(r"\S+"))
    n_lines_distinct = (
        F.size(F.array_distinct(raw_lines))
        - F.array_contains(raw_lines, "").cast("int")
    )
    n_words_distinct = (
        F.size(F.array_distinct(raw_toks))
        - F.array_contains(raw_toks, "").cast("int")
    )
    dup_line_frac = F.round(
        F.when(n_lines > 0,
               F.lit(1.0) - n_lines_distinct / n_lines
               ).otherwise(F.lit(0.0)), 6)
    dup_word_frac = F.round(
        F.when(n_words > 0,
               F.lit(1.0) - n_words_distinct / n_words
               ).otherwise(F.lit(0.0)), 6)
    sum_len = F.length(F.regexp_replace(col, r"\s", "")).cast("long")
    mean_word_len = F.round(
        F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0)), 6)
    symbol_word_ratio = F.round(
        F.when(n_words > 0,
               F.regexp_count(col, F.lit(r"#|\.\.\.")) / n_words
               ).otherwise(F.lit(0.0)), 6)
    keep = (
        (n_words >= 50) & (n_words <= 100000)
        & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
        & (dup_line_frac <= 0.30) & (symbol_word_ratio <= 0.10)
    )
    return {
        "n_words": n_words,
        "dup_line_frac": dup_line_frac,
        "dup_word_frac": dup_word_frac,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_word_ratio,
        "gopher_keep": keep,
    }


# ---------------------------------------------------------------------------
# Vocabulary statistics — corpus-level term and document frequencies with a
# deterministic top-k (count desc, word asc): the tokenizer-training /
# corpus-profiling primitive. Partial+final hash aggregate, then one tiny
# top-k sort on the aggregated (vocab-sized) side.
def vocabulary_stats(df, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 100):
    toks = df.select(
        F.col(id_col),
        F.explode(_nonempty(tokens(F.lower(F.col(text_col))))).alias("word"),
    )
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"),
             F.count_distinct(id_col).alias("n_docs"))
        .orderBy(F.desc("n_occurrences"), F.asc("word"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Unigram log-probability scoring — the cheap perplexity proxy used to rank
# crawl documents by "typicality" before the expensive model-based filters.
# Two aggregation passes over the token stream: corpus unigram counts
# (partial+final hash agg), then a shuffle equi-join of the token stream
# against the vocabulary and a per-doc average. The vocabulary join is NOT
# broadcast by design: at crawl scale the long-tail vocab is many GB, and
# the join key (word) is exactly the aggregation key, so AQE coalesces the
# two stages onto one exchange. Inner log values are rounded to 6 decimals
# BEFORE averaging so both engines sum identical summands (libm ln differs
# in ulps across engines).
def unigram_logprob(df, text_col: str = "text", id_col: str = "doc_id"):
    toks = df.select(
        F.col(id_col),
        F.explode(_nonempty(tokens(F.lower(F.col(text_col))))).alias("word"),
    )
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n_word"))
    total = toks.count()
    scored = toks.join(vocab, "word")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.round(F.log(F.col("n_word") / F.lit(float(total))), 6)), 6
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document — the classic keyword/routing signal.
# tf from a (doc, word) hash agg, df from a word hash agg, idf joined back
# on word (same key as the df agg => one exchange), then a doc-keyed
# row_number window for the top-k — bounded partitions (one doc's vocab).
# Scores are rounded before ranking so the order (score desc, word asc) is
# engine-stable.
def tfidf_topk(df, k: int = 5, text_col: str = "text", id_col: str = "doc_id"):
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(_nonempty(tokens(F.lower(F.col(text_col))))).alias("word"),
    )
    tf = toks.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("word").agg(F.count_distinct(id_col).alias("df"))
    # corpus doc count as a broadcast 1-row frame instead of an EAGER
    # .count() action at plan-build time — one less job per invocation,
    # identical integer (the cast to double matches the old literal).
    n_docs_df = F.broadcast(
        df.select(id_col).distinct().agg(
            F.count(F.lit(1)).cast("double").alias("_n_docs")
        )
    )
    scored = tf.join(dfreq, "word").crossJoin(n_docs_df).select(
        id_col, "word", "tf",
        F.round(
            F.col("tf") * F.round(F.log(F.col("_n_docs") / F.col("df")), 6), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "word", "tf", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# Sequence packing — assign documents to fixed-token-budget packs, the
# standard LLM pre-training batching step. Deterministic spec: within a
# shard (doc_id % n_shards), documents are laid out in doc_id order as one
# contiguous token stream; a document's pack is the pack containing its
# START offset (documents may straddle a boundary — real pipelines split
# them at materialization; the assignment itself is what we compute).
# One window cumsum per shard: shards ARE the parallelism, so the sort is
# shard-local and the shuffle is a single hash exchange on shard.
def _pack_starts(df, n_shards: int, id_col: str, text_col: str):
    """(id, shard, n_tokens, start): each document's start offset in its
    shard's contiguous token stream — the shared base of pack_sequences
    and pack_chunks. One shard-keyed exchange; shards are the parallelism."""
    from pyspark.sql import Window

    shard = (F.col(id_col) % n_shards).alias("shard")
    base = df.select(F.col(id_col), shard,
                     token_count(F.col(text_col)).alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    # Pure integer arithmetic with explicit BIGINT: the DuckDB oracle's
    # SUM() OVER yields HUGEINT and a float-floor pack_id hashed
    # differently under a strict driver normalizer (round-3 red cell).
    start = (cum - F.col("n_tokens")).cast("long")
    return base.select(id_col, "shard", "n_tokens", start.alias("start"))


def pack_sequences(df, budget: int = 2048, n_shards: int = 8,
                   id_col: str = "doc_id", text_col: str = "text"):
    return _pack_starts(df, n_shards, id_col, text_col).select(
        id_col, "shard", "n_tokens",
        F.expr(f"start DIV {budget}").cast("long").alias("pack_id"),
        (F.col("start") % budget).cast("long").alias("pack_offset"),
    )


def pack_chunks(df, budget: int = 2048, n_shards: int = 8,
                id_col: str = "doc_id", text_col: str = "text"):
    """Materialize the pack layout: one row per (document, pack) CHUNK.

    ``pack_sequences`` assigns each document to the pack containing its
    start; real pipelines then SPLIT boundary-straddling documents at
    materialization. This emits the splits: a document spanning packs
    p..q yields q-p+1 chunks with 0-based token ranges
    ``[tok_from, tok_to)`` within the document. Per-row fan-out is
    ceil(n_tokens/budget)+1, bounded by the longest document — the same
    skew shape as segmentation, broken the same way (chunks explode from
    the shard-windowed row, all integer arithmetic, no second shuffle).
    """
    first = F.expr(f"start DIV {budget}")
    last = F.expr(f"(start + n_tokens - 1) DIV {budget}")
    chunk = F.explode(F.sequence(first, last)).alias("pack_id")
    base = _pack_starts(df, n_shards, id_col, text_col).filter(
        F.col("n_tokens") > 0
    )
    p = F.col("pack_id")
    tok_from = F.greatest(p * budget - F.col("start"), F.lit(0))
    tok_to = F.least((p + 1) * budget - F.col("start"), F.col("n_tokens"))
    return base.select(id_col, "shard", "n_tokens", "start", chunk).select(
        id_col, "shard",
        p.cast("long").alias("pack_id"),
        tok_from.cast("long").alias("tok_from"),
        tok_to.cast("long").alias("tok_to"),
    )


# ---------------------------------------------------------------------------
# URL normalization — canonical form for crawl-level dedup and per-host
# aggregation (the input_hint table keys pages by url). Regex-only so the
# DuckDB oracle is an exact mirror; no parse_url (DuckDB has none).
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def url_host(col: Column) -> Column:
    """Lowercased host with any :80/:443 default port stripped."""
    return F.regexp_replace(F.lower(F.regexp_extract(col, _HOST_RE, 1)),
                            ":(80|443)$", "")


def url_normalize(col: Column) -> Column:
    """scheme://host/path with lowercased scheme+host, default port, query
    string, fragment and trailing slash stripped. Rows that do not look
    like absolute URLs normalize to '' (callers filter)."""
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    path = F.regexp_replace(F.regexp_extract(col, _PATH_RE, 1), "/$", "")
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), url_host(col), path))


def normalize_unicode(col: Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the canonical first
    cleaning pass on a real crawl (combining sequences, compatibility
    forms, mojibake artifacts) BEFORE fingerprinting/dedup, so visually
    identical pages hash identically.

    The one textops operator that is a UDF: the JVM has no normalizer
    exposed through pyspark.sql.functions, so this is an Arrow-batched
    pandas UDF over unicodedata (C-implemented, ~1 GB/s per core) — a
    narrow per-row map with zero shuffle implications. The DuckDB oracle
    is nfc_normalize()."""
    import unicodedata

    import pandas  # noqa: F401 — resolves the UDF's string annotations
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _norm(s):
        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    _norm.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf(T.StringType())(_norm)(col)
