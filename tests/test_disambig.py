"""Candidate generation + disambiguation semantics (D2-D6)."""

from pyspark.sql import functions as F

from kgspark.disambig import doc_tokens, generate_candidates, disambiguate, link_mentions
from kgspark.schemas import LEXICON_SCHEMA

LEX_ROWS = [
    # ambiguous: context decides
    ("spark", "uri:spark_sw", 0.5, 100, ["Software"], ["Q7397"], "query table"),
    ("spark", "uri:spark_fire", 0.5, 100, ["Thing"], ["Q3196"], "flame ember"),
    # low support
    ("ember", "uri:ember", 1.0, 5, ["Thing"], [], "flame"),
    # low prior, high prior
    ("table", "uri:table_db", 0.9, 100, ["Software"], ["Q7397"], "query"),
    ("table", "uri:table_furn", 0.1, 100, ["Artifact"], ["Q14748"], "wood"),
]


def lex(spark):
    return spark.createDataFrame(LEX_ROWS, LEXICON_SCHEMA)


def spots_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "start", "text"])


def docs_df(spark, rows):
    return spark.createDataFrame(rows, ["url", "text"])


def test_support_filter(spark):
    cands = generate_candidates(
        spots_df(spark, [("d1", 1, "ember")]), lex(spark), min_support=20
    )
    assert cands.count() == 0
    cands = generate_candidates(
        spots_df(spark, [("d1", 1, "ember")]), lex(spark), min_support=1
    )
    assert cands.count() == 1


def test_context_disambiguation_beats_prior_tie(spark):
    docs = docs_df(spark, [("d1", "the query table has spark in it"),
                           ("d2", "flame ember spark glow")])
    spots = spots_df(spark, [("d1", 22, "spark"), ("d2", 13, "spark")])
    out = disambiguate(
        generate_candidates(spots, lex(spark)), doc_tokens(docs), confidence=0.3,
        lexicon=lex(spark),
    )
    got = {r["doc_id"]: r["dbpedia_uri"] for r in out.collect()}
    assert got == {"d1": "uri:spark_sw", "d2": "uri:spark_fire"}


def test_confidence_filter_drops_uncertain(spark):
    # no context signal, equal priors => conf = 0.5 each; threshold 0.9 drops
    docs = docs_df(spark, [("d1", "nothing relevant spark here")])
    spots = spots_df(spark, [("d1", 18, "spark")])
    cands = generate_candidates(spots, lex(spark))
    assert disambiguate(cands, doc_tokens(docs), confidence=0.9, lexicon=lex(spark)).count() == 0
    assert disambiguate(cands, doc_tokens(docs), confidence=0.35, lexicon=lex(spark)).count() == 1


def test_prior_wins_without_context(spark):
    docs = docs_df(spark, [("d1", "a table stands")])
    spots = spots_df(spark, [("d1", 3, "table")])
    out = disambiguate(generate_candidates(spots, lex(spark)), doc_tokens(docs), lexicon=lex(spark))
    assert out.collect()[0]["dbpedia_uri"] == "uri:table_db"


def test_types_restriction(spark):
    docs = docs_df(spark, [("d1", "a query table stands")])
    spots = spots_df(spark, [("d1", 9, "table")])
    out = disambiguate(
        generate_candidates(spots, lex(spark)),
        doc_tokens(docs),
        types=["Artifact"],
        lexicon=lex(spark),
    )
    assert out.count() == 0  # winner is table_db (Software); Artifact filter drops
    out2 = disambiguate(
        generate_candidates(spots, lex(spark)),
        doc_tokens(docs),
        types=["Software"],
        lexicon=lex(spark),
    )
    assert out2.count() == 1


def test_type_pivot_format(spark):
    docs = docs_df(spark, [("d1", "query table")])
    out = link_mentions(
        spots_df(spark, [("d1", 7, "table")]), lex(spark), docs
    )
    r = out.collect()[0]
    assert r["DBpedia_type"] == "|Software|"
    assert r["Wikidata_type"] == "|Q7397|"
    assert r["types"]["DBpedia"] == ["Software"]
