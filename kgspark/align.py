"""Token/region alignment operators (J1-J4, SURVEY §2.5).

The reference maps character-offset mentions onto CWB token positions
(``cpos``): an equi-join on (start, text) for exact hits
(``R/dbpedia.R:876``), as-of boundary expansion for inexact spans
(``expand_fun``, ``R/dbpedia.R:835-852``), a grouped min/max resolution per
mention (``R/dbpedia.R:857-868``) and a point-in-region rewrite against
structural-attribute spans (``R/dbpedia.R:885-897``).

Spark formulation: the token table is derived from the document text with
``posexplode`` + a running-sum window (char offsets = cumsum(len+1), the
same arithmetic as segmentation); alignment is an equi-join on doc_id with
range predicates, aggregated per mention — doc-local, so the only shuffle
is the doc_id co-partitioning. End convention here is
``end = start + nchar(text) - 1`` (R/dbpedia.R:856 — intentionally distinct
from the overlap module's convention, see kgspark.overlaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def token_table(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text",
    with_gap: bool = False,
) -> DataFrame:
    """(doc_id, cpos, word, begin, end): cpos 1-based, begin/end 1-based
    inclusive char offsets.

    Arrow kernel instead of the original posexplode + running-sum window:
    the offsets are a per-document cumulative sum, so computing them
    inside the scan task removes a full-token-stream exchange + sort
    (the window shuffled every token of the corpus just to add begin/end).
    Token semantics are identical: ``text.split(" ")`` in Python equals
    Spark's ``split(text, ' ')`` (limit -1: empties kept, incl. trailing).
    ``with_gap=True`` additionally emits each token's distance to its
    predecessor's end (``begin - prev_end``; 1 for the first token) so
    ``_safe_bucket_chars`` needs no lag window either.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    id_type = docs.schema[doc_col].dataType
    fields = [
        T.StructField("doc_id", id_type),
        T.StructField("cpos", T.IntegerType()),
        T.StructField("word", T.StringType()),
        T.StructField("begin", T.LongType()),
        T.StructField("end", T.LongType()),
    ]
    if with_gap:
        fields.append(T.StructField("gap", T.LongType()))
    schema = T.StructType(fields)

    def kernel(batches):
        for pdf in batches:
            ids: list = []
            cpos, words, begins, ends, gaps = [], [], [], [], []
            for d, t in zip(pdf[doc_col], pdf[text_col]):
                if t is None:
                    continue  # posexplode(split(NULL)) emitted no rows
                toks = t.split(" ")
                n = len(toks)
                lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                                   count=n)
                b = np.empty(n, dtype=np.int64)
                b[0] = 1
                np.cumsum(lens[:-1] + 1, out=b[1:])
                b[1:] += 1
                e = b + lens - 1
                ids.extend([d] * n)
                cpos.append(np.arange(1, n + 1, dtype=np.int32))
                words.extend(toks)
                begins.append(b)
                ends.append(e)
                if with_gap:
                    g = np.empty(n, dtype=np.int64)
                    g[0] = b[0]
                    g[1:] = b[1:] - e[:-1]
                    gaps.append(g)
            out = {
                "doc_id": ids,
                "cpos": np.concatenate(cpos) if cpos else np.array([], np.int32),
                "word": words,
                "begin": np.concatenate(begins) if begins else np.array([], np.int64),
                "end": np.concatenate(ends) if ends else np.array([], np.int64),
            }
            if with_gap:
                out["gap"] = (
                    np.concatenate(gaps) if gaps else np.array([], np.int64)
                )
            yield pd.DataFrame(out)

    return docs.select(F.col(doc_col), F.col(text_col)).mapInPandas(
        kernel, schema
    )


def _safe_bucket_chars(tokens: DataFrame, floor_chars: int = 512) -> int:
    """Smallest bucket width that preserves the ±1-guard-bucket as-of
    guarantee for THIS token table: one guard bucket must reach back past
    the longest (inter-token gap + token) run. One cheap eager agg — and
    when the token table carries the kernel-computed ``gap`` column
    (token_table(with_gap=True)) the derivation is a plain narrow
    aggregate with no lag window/exchange at all."""
    if "gap" in tokens.columns:
        g = tokens.withColumn("_gap", F.col("gap"))
    else:
        w = Window.partitionBy("doc_id").orderBy("cpos")
        g = tokens.withColumn(
            "_gap", F.col("begin") - F.coalesce(F.lag("end").over(w), F.lit(0))
        )
    row = g.agg(
        F.max(F.col("end") - F.col("begin") + 1).alias("tok"),
        F.max("_gap").alias("gap"),
    ).first()
    longest = int(row["tok"] or 0) + int(row["gap"] or 0)
    return max(floor_chars, longest + 2)


def align_mentions(
    mentions: DataFrame,
    tokens: DataFrame,
    bucket_chars: int | None = None,
    expand_to_token: bool = True,
) -> DataFrame:
    """Attach cpos_left / cpos_right to each (doc_id, start, text) mention.

    With ``expand_to_token=True`` (default, the reference's expand path):
    cpos_left  = last token starting at or before the mention start
                 (equi hit, else strict-predecessor fallback —
                 R/dbpedia.R:846-851);
    cpos_right = first token ending at or after the mention end
                 (R/dbpedia.R:838-845).
    With ``expand_to_token=False``: only EXACT boundary hits count
    (``token.begin == start`` / ``token.end == end``); misaligned spans
    stay NULL — the reference's default, whose rows are then dropped as
    'inexact annotations' (P9, R/dbpedia.R:926-934; the 10-vs-11-row
    contract of tests/testthat/test-expand_to_token.R).

    Join shape: a naive ``mentions ⋈ tokens ON doc_id`` aggregates every
    token of the document per mention — O(mentions × doc_tokens), the
    quadratic hotspot on long crawl documents. Instead both sides are
    keyed by a char-range bucket: each token lands in exactly one bucket
    (by ``begin``, so pairs are never duplicated) and each mention
    explodes to its span's buckets ± 1 guard bucket, which is where its
    as-of boundary tokens must live as long as every token + gap is
    shorter than ``bucket_chars``. Per-mention work is then O(span/B · B)
    ≈ O(span), independent of document length.

    ``bucket_chars=None`` (default) DERIVES a safe width from the data
    (``_safe_bucket_chars``: ≥ longest gap+token run, floor 512), so
    pathological whitespace or kilo-char tokens widen the buckets instead
    of silently dropping the mention as 'inexact'. Pass an explicit int
    to skip the derivation job when the corpus is known well-behaved.
    """
    if bucket_chars is None:
        bucket_chars = _safe_bucket_chars(tokens)
    m = mentions.withColumn("m_end", F.col("start") + F.length("text") - 1)
    tb = tokens.drop("gap").withColumn(
        "_bkt", F.floor((F.col("begin") - 1) / bucket_chars)
    )
    mb = m.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((F.col("start") - 1) / bucket_chars) - 1,
                F.floor((F.col("m_end") - 1) / bucket_chars) + 1,
            )
        ),
    )
    j = mb.join(tb, ["doc_id", "_bkt"])
    if expand_to_token:
        left_cond = F.col("begin") <= F.col("start")
        right_cond = F.col("end") >= F.col("m_end")
    else:
        left_cond = F.col("begin") == F.col("start")
        right_cond = F.col("end") == F.col("m_end")
    return (
        j.groupBy("doc_id", "start", "text", "m_end")
        .agg(
            F.max(F.when(left_cond, F.col("cpos"))).alias("cpos_left"),
            F.min(F.when(right_cond, F.col("cpos"))).alias("cpos_right"),
            # J3 analogue: ids of tokens fully covered by the mention span,
            # pipe-joined in cpos order (R/dbpedia.R:1247-1258)
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                (F.col("begin") >= F.col("start"))
                                & (F.col("end") <= F.col("m_end")),
                                F.struct(F.col("cpos"), F.col("word")),
                            )
                        )
                    ),
                    lambda r: r["word"],
                ),
                "|",
            ).alias("covered_words"),
        )
        .withColumnRenamed("m_end", "end")
    )


def drop_inexact(aligned: DataFrame) -> DataFrame:
    """P9: drop rows whose span did not align to token boundaries."""
    return aligned.filter(
        F.col("cpos_left").isNotNull() & F.col("cpos_right").isNotNull()
    )


def sentence_regions(
    tokens: DataFrame, tokens_per_region: int = 10
) -> DataFrame:
    """Synthetic structural-attribute spans: fixed-width token windows
    (stand-in for CWB s-attributes; region matrix analogue,
    R/dbpedia.R:891-896)."""
    t = tokens.withColumn(
        "struc_id", F.floor((F.col("cpos") - 1) / tokens_per_region)
    )
    return t.groupBy("doc_id", "struc_id").agg(
        F.min("cpos").alias("region_cpos_l"),
        F.max("cpos").alias("region_cpos_r"),
    )


def align_regions(
    aligned: DataFrame, regions: DataFrame
) -> DataFrame:
    """J4: point-in-range join cpos_left -> containing region; mention
    bounds are overwritten with the full region bounds
    (R/dbpedia.R:885-897)."""
    j = aligned.join(regions, "doc_id").filter(
        (F.col("cpos_left") >= F.col("region_cpos_l"))
        & (F.col("cpos_left") <= F.col("region_cpos_r"))
    )
    return j.select(
        "doc_id",
        "start",
        "text",
        F.col("struc_id"),
        F.col("region_cpos_l").alias("cpos_left"),
        F.col("region_cpos_r").alias("cpos_right"),
    )
