"""Sampling / curation operators: mixture thinning, stratified top-k,
unigram log-prob, tf-idf, duplicated n-gram spans."""

import math

import pytest
from pyspark.sql import Window, functions as F

from kgspark.dedup import _hash64_expr, dup_ngram_spans
from kgspark.sampling import mixture_sample, stratified_sample
from kgspark.textops import tfidf_topk, unigram_logprob

from tests.conftest import rows_as_tuples


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i % 7} common text row {i}", "en", f"s{i % 4}", 10)
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_mixture_sample_deterministic_and_weighted(docs):
    out = mixture_sample(docs, {"s0": 1.0, "s1": 0.5, "s2": 0.0})
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    # weight 1.0 keeps everything, 0.0 keeps nothing, absent source dropped
    assert by_src["s0"] == 100
    assert "s2" not in by_src and "s3" not in by_src
    # 0.5 keeps about half (md5-uniform; 100 draws, generous bounds)
    assert 25 <= by_src["s1"] <= 75
    # bit-for-bit reproducible
    again = mixture_sample(docs, {"s0": 1.0, "s1": 0.5, "s2": 0.0})
    assert rows_as_tuples(out, "doc_id") == rows_as_tuples(again, "doc_id")


def test_stratified_sample_matches_naive_window(docs):
    out = stratified_sample(docs, k=5, n_salts=4)
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts == {"s0": 5, "s1": 5, "s2": 5, "s3": 5}
    # the two-level salted top-k must equal the naive single window
    h = _hash64_expr(F.col("doc_id").cast("string")).alias("_h")
    w = Window.partitionBy("source").orderBy("_h", "doc_id")
    naive = (
        docs.select("doc_id", "source", h)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "source", "rank")
    )
    assert rows_as_tuples(out, "doc_id", "source", "rank") == rows_as_tuples(
        naive, "doc_id", "source", "rank"
    )


def test_stratified_sample_small_stratum(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
        "doc_id long, text string, source string",
    )
    out = stratified_sample(df, k=10)
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts == {"x": 2, "y": 1}


def test_unigram_logprob_uniform_corpus(spark):
    # 4 docs x 1 token, all distinct words: every p = 1/4
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(["aa", "bb", "cc", "dd"])],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
           for r in unigram_logprob(df).collect()}
    expected = round(math.log(0.25), 6)
    assert got == {i: (1, expected) for i in range(4)}


def test_tfidf_ranks_rare_terms_highest(spark):
    df = spark.createDataFrame(
        [(1, "shared shared rare1"), (2, "shared shared rare2")],
        "doc_id long, text string",
    )
    out = tfidf_topk(df, k=1)
    got = rows_as_tuples(out, "doc_id", "word", "rank")
    # 'shared' has df=2 => idf 0; the rare term wins despite tf=1
    assert got == [(1, "rare1", 1), (2, "rare2", 1)]


def test_dup_ngram_spans_planted_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(10))  # 10-word shared block
    df = spark.createDataFrame(
        [
            (1, f"u1 u2 u3 {boiler} v1 v2"),
            (2, f"w1 {boiler} w2 w3 w4"),
            (3, "all unique words here nothing repeated at all ok"),
        ],
        "doc_id long, text string",
    )
    out = dup_ngram_spans(df, n=8, min_docs=2)
    got = rows_as_tuples(out, "doc_id", "span_start", "span_end")
    # doc1: boiler at words 4..13 -> 8-gram starts 4,5,6 -> span [4, 13]
    # doc2: boiler at words 2..11 -> starts 2,3,4 -> span [2, 11]
    assert got == [(1, 4, 13), (2, 2, 11)]
    assert out.filter(F.col("doc_id") == 3).count() == 0


def test_dup_ngram_spans_merges_nearby(spark):
    block = " ".join(f"c{i}" for i in range(8))
    # two copies of the same 8-gram inside ONE doc do not count (distinct
    # docs >= 2 is the predicate), but shared blocks near each other merge
    df = spark.createDataFrame(
        [
            (1, f"{block} gap {block}"),
            (2, f"{block} x y z"),
        ],
        "doc_id long, text string",
    )
    out = dup_ngram_spans(df, n=8, min_docs=2)
    got = rows_as_tuples(out, "doc_id", "span_start", "span_end", "n_grams")
    # doc1: dup starts at 1 and 10 (distance 9 > n=8 -> separate spans)
    assert (1, 1, 8, 1) in got and (1, 10, 17, 1) in got
    assert (2, 1, 8, 1) in got


def test_dup_ngram_spans_short_docs(spark):
    # Regression: docs with fewer than n tokens used to crash the query —
    # F.sequence(1, k<=0) yields the DESCENDING array [1, 0] and
    # slice(toks, 0, n) throws INVALID_PARAMETER_VALUE.START. Short docs
    # must contribute zero n-grams, matching the oracle's empty
    # generate_series(1, k<=0).
    block = " ".join(f"d{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            (1, "short"),
            (2, "two words"),
            (3, ""),
            (4, f"{block} tail"),
            (5, f"head {block}"),
        ],
        "doc_id long, text string",
    )
    out = dup_ngram_spans(df, n=8, min_docs=2)
    got = rows_as_tuples(out, "doc_id", "span_start", "span_end")
    assert got == [(4, 1, 8), (5, 2, 9)]


def test_uniform_sample_exact_n_and_deterministic(docs, spark):
    from kgspark.sampling import uniform_sample

    out = uniform_sample(docs, n=25)
    rows = rows_as_tuples(out, "doc_id", "rank")
    assert len(rows) == 25
    assert sorted(r[1] for r in rows) == list(range(1, 26))
    again = uniform_sample(docs, n=25)
    assert rows == rows_as_tuples(again, "doc_id", "rank")
    # n beyond the corpus returns everything
    assert uniform_sample(docs, n=10_000).count() == 400


def test_assign_splits_partitions_every_row(docs):
    from kgspark.sampling import assign_splits

    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 400
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    # same doc always lands in the same split
    again = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert rows_as_tuples(out, "doc_id", "split") == rows_as_tuples(
        again, "doc_id", "split"
    )


def test_pack_chunks_tile_each_document(spark):
    from kgspark.textops import pack_chunks, pack_sequences

    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 5)), (8, " ".join(["w"] * 9)), (16, "")],
        "doc_id long, text string",
    )
    # budget 4, one shard: doc0 tokens [0,5) -> packs 0,1; doc8 starts at 5
    # -> packs 1,2,3; doc16 empty -> split('') yields one token '' (the
    # pack_sequences convention), so it lands one chunk
    out = pack_chunks(df, budget=4, n_shards=1)
    got = rows_as_tuples(out, "doc_id", "pack_id", "tok_from", "tok_to")
    assert got == [
        (0, 0, 0, 4), (0, 1, 4, 5),
        (8, 1, 0, 3), (8, 2, 3, 7), (8, 3, 7, 9),
        (16, 3, 0, 1),
    ]
    # chunks tile each document exactly: sum of ranges == n_tokens, and
    # every doc's first chunk starts at 0
    sums = {r["doc_id"]: r["s"] for r in out.groupBy("doc_id")
            .agg(F.sum(F.col("tok_to") - F.col("tok_from")).alias("s")).collect()}
    packs = {r["doc_id"]: (r["n_tokens"], r["pack_id"]) for r in
             pack_sequences(df, budget=4, n_shards=1).collect()}
    for doc, (n_tok, first_pack) in packs.items():
        assert sums[doc] == n_tok
        # pack_sequences' assigned pack == the doc's FIRST chunk pack
        assert min(p for d, p, f, t in got if d == doc) == first_pack


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    from kgspark.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["qvec"] == [127, -63, 32, 0]  # floor(x*127 + 0.5)
    assert rows[1]["scale"] == 127.0
    assert rows[2]["qvec"] == [0, 0, 0, 0] and rows[2]["scale"] == 0.0
    # dequantized error bounded by half a step
    step = 1.0 / 127.0
    deq = [q / 127.0 for q in rows[1]["qvec"]]
    for x, xq in zip([1.0, -0.5, 0.25, 0.0], deq):
        assert abs(x - xq) <= step / 2 + 1e-12
