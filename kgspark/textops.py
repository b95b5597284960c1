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


def _marker_count(col: Column, markers: list[str]) -> Column:
    toks = tokens(F.lower(col))
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


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
    toks = tokens(F.lower(col))
    arr = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    n = F.size(toks)
    return F.when(n > 0, F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n).otherwise(F.lit(0.0))


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
