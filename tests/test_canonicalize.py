"""Redirect fixpoint closure + sameAs enrichment (J9/J10)."""

from kgspark.canonicalize import canonicalize, close_redirects, wikidata_properties
from kgspark.schemas import REDIRECTS_SCHEMA, SAMEAS_SCHEMA


def test_close_redirects_two_hop_chain(spark):
    r = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], REDIRECTS_SCHEMA
    )
    closed = {(row["src_uri"], row["dst_uri"]) for row in close_redirects(r).collect()}
    assert closed == {("a", "c"), ("b", "c"), ("x", "y")}


def test_close_redirects_long_chain_path_doubling(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(10)]
    closed = close_redirects(spark.createDataFrame(chain, REDIRECTS_SCHEMA))
    got = {row["src_uri"]: row["dst_uri"] for row in closed.collect()}
    assert all(v == "n10" for v in got.values())


def test_canonicalize_joins(spark):
    mentions = spark.createDataFrame(
        [("d1", "a"), ("d1", "q"), ("d2", "b")], ["doc_id", "dbpedia_uri"]
    )
    redirects = close_redirects(
        spark.createDataFrame([("a", "b"), ("b", "c")], REDIRECTS_SCHEMA)
    )
    sameas = spark.createDataFrame(
        [("c", "http://www.wikidata.org/entity/Q42", "Q42")], SAMEAS_SCHEMA
    )
    out = canonicalize(mentions, redirects, sameas)
    got = {(r["dbpedia_uri"], r["canonical_uri"], r["wikidata_id"]) for r in out.collect()}
    assert got == {
        ("a", "c", "Q42"),
        ("q", "q", None),   # no redirect, no sameAs
        ("b", "c", "Q42"),
    }


def test_wikidata_properties_collapse(spark):
    m = spark.createDataFrame([("Q42", "u1")], ["wikidata_id", "doc_id"])
    labels = spark.createDataFrame(
        [("Q42", "thing", "P31", "instance of"), ("Q42", "thing", "P17", "country")],
        "wikidata_id string, label string, prop_id string, prop_label string",
    )
    out = wikidata_properties(m, labels).collect()[0]
    assert out["prop_labels"] == "country|instance of"
