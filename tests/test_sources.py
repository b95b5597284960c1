"""Adapters/sinks: token-table decode (S3), TEI source (S6), TEI enrich
sink (K2), lookup (S9), highlight view (K3)."""

from kgspark.sources import (
    enrich_tei_document,
    from_tei,
    from_token_table,
    highlight_view,
    lookup,
    parse_tei_tokens,
    reconstruct_tei_text,
)
from kgspark.synth import lexicon_df

TEI = (
    '<s><w xml:id="t1">Berlin</w><w xml:id="t2">ist</w>'
    '<w xml:id="t3" join="right">gross</w><pc xml:id="t4">.</pc></s>'
)


def test_parse_tei_tokens_offsets_and_join():
    toks = parse_tei_tokens(TEI)
    assert [t["word"] for t in toks] == ["Berlin", "ist", "gross", "."]
    assert [t["start"] for t in toks] == [1, 8, 12, 17]
    # join="right" on 'gross' glues the period: "Berlin ist gross."
    assert reconstruct_tei_text(toks) == "Berlin ist gross."


def test_pc_attaches_without_explicit_join():
    toks = parse_tei_tokens('<w id="a">Hi</w><pc id="b">!</pc>')
    assert reconstruct_tei_text(toks) == "Hi!"


def test_from_tei_dataframe(spark):
    df = spark.createDataFrame([("d1", TEI)], ["doc_id", "xml"])
    row = from_tei(df).collect()[0]
    assert row["text"] == "Berlin ist gross."
    assert [t["cpos"] for t in row["tokens"]] == [1, 2, 3, 4]
    assert row["tokens"][0]["token_id"] == "t1"


def test_enrich_tei_wraps_token_run():
    out = enrich_tei_document(
        TEI, [{"token_ids": ["t1"], "ref": "dbr:Berlin", "type": "LOCATION"}]
    )
    assert '<name ref="dbr:Berlin" type="LOCATION"><w xml:id="t1">Berlin</w></name>' in out


def test_enrich_tei_multi_token_run():
    xml = '<w id="a">Vice</w> <w id="b">President</w> <w id="c">Gore</w>'
    out = enrich_tei_document(
        xml, [{"token_ids": ["a", "b", "c"], "ref": "dbr:Al_Gore"}]
    )
    assert out.startswith('<name ref="dbr:Al_Gore"><w id="a">')
    assert out.endswith('</w></name>')


def test_from_token_table_with_stoplist(spark):
    toks = spark.createDataFrame(
        [("d", 1, "the"), ("d", 2, "spark"), ("d", 3, "engine")],
        ["doc_id", "cpos", "word"],
    )
    out = from_token_table(toks, stoplist=["the"]).collect()[0]
    assert out["text"] == "spark engine"


def test_lookup_ranked_by_support(spark):
    rows = lookup(lexicon_df(spark), "spark", max_results=2).collect()
    assert rows[0]["uri"] == "dbr:Apache_Spark"
    assert rows[0]["support"] >= rows[-1]["support"]


def test_highlight_view_colors(spark):
    m = spark.createDataFrame(
        [("PERSON",), ("LOCATION",), ("ORGANIZATION",), ("MISC",), ("OTHER",)],
        ["category"],
    )
    got = [r["color"] for r in highlight_view(m).collect()]
    assert got == ["yellow", "lightgreen", "lightskyblue", "lightgrey", "lavender"]
