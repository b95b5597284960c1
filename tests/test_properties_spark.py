"""Hypothesis invariants that need a SparkSession (small example counts —
each example is a Spark job). Pure-kernel properties live in
test_properties.py."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window, functions as F

from kgspark.dedup import _hash64_expr
from kgspark.sampling import stratified_sample
from kgspark.textops import pack_chunks, pack_sequences


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.integers(2, 64),
    st.integers(1, 4),
)
def test_pack_chunks_tiling_invariants(spark, lengths, budget, n_shards):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(lengths)],
        "doc_id long, text string",
    )
    chunks = pack_chunks(docs, budget=budget, n_shards=n_shards).collect()
    packs = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=budget, n_shards=n_shards).collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r["pack_id"])
        # chunks tile the document: contiguous [tok_from, tok_to) ranges
        # starting at 0 and summing to n_tokens (split('') -> 1 token)
        n_tokens = packs[doc]["n_tokens"]
        assert rows[0]["tok_from"] == 0
        assert sum(r["tok_to"] - r["tok_from"] for r in rows) == n_tokens
        for a, b in zip(rows, rows[1:]):
            assert b["pack_id"] == a["pack_id"] + 1
            assert b["tok_from"] == a["tok_to"]
        # every chunk fits the budget and is non-empty
        assert all(0 < r["tok_to"] - r["tok_from"] <= budget for r in rows)
        # the assignment operator's pack == the first chunk's pack
        assert rows[0]["pack_id"] == packs[doc]["pack_id"]


@settings(max_examples=8, deadline=None)
@given(st.integers(1, 60), st.integers(1, 12), st.integers(1, 8), st.integers(2, 5))
def test_stratified_two_level_equals_naive(spark, n_rows, k, n_salts, n_strata):
    docs = spark.createDataFrame(
        [(i, f"s{i % n_strata}") for i in range(n_rows)],
        "doc_id long, source string",
    )
    out = sorted(
        tuple(r)
        for r in stratified_sample(
            docs, k=k, n_salts=n_salts
        ).collect()
    )
    h = _hash64_expr(F.col("doc_id").cast("string")).alias("_h")
    w = Window.partitionBy("source").orderBy("_h", "doc_id")
    naive = sorted(
        tuple(r)
        for r in docs.select("doc_id", "source", h)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "source", "rank")
        .collect()
    )
    assert out == naive
