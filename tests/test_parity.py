"""Triple-set precision/recall vs reference-derived gold annotations.

BASELINE.md metric: triple P/R >= 0.95 against the reference's
get_dbpedia_uris/as_subcorpus annotations on its fixture documents
(GermaParl/REUTERS-style + the golden one-liners). The gold set below is
derived from the reference's own unit-test goldens (FIXTURES.md §4-6):
expected mentions per golden doc -> expected (subj, pred, obj) triples
under this engine's emission rules.
"""

from kgspark import synth
from kgspark.pipeline import PipelineConfig, run_pipeline

# gold mentions on the golden docs (reference unit-test expectations):
# (doc, surface, canonical_uri, wikidata_uri, dbpedia_types, category)
GOLD = [
    ("golden://g1", "Vice President Gore", "dbr:Al_Gore", None,
     ["Person", "Agent", "OfficeHolder"], "PERSON"),
    ("golden://g1", "Washington D.C.", "dbr:Washington,_D.C.", None,
     ["Place", "Location", "City"], "LOCATION"),
    ("golden://g2", "Crude oil", "dbr:Petroleum", None,
     ["ChemicalSubstance"], "MISC"),
    ("golden://g3", "Berlin", "dbr:Berlin", None,
     ["Place", "Location", "City"], "LOCATION"),
    ("golden://g3", "capital", "dbr:Capital_city", None, [], "MISC"),
    ("golden://g3", "Germany", "dbr:Germany", None,
     ["Place", "Location", "Country"], "LOCATION"),
    ("golden://g4", "Deutsche Bundestag", "dbr:Bundestag", None,
     ["Organisation", "Legislature"], "ORGANIZATION"),
    ("golden://g4", "Berlin", "dbr:Berlin", None,
     ["Place", "Location", "City"], "LOCATION"),
]


def gold_triples() -> set[tuple[str, str, str]]:
    out = set()
    for doc, text, uri, wikidata, types, category in GOLD:
        out.add((uri, "kg:mentionedIn", doc))
        out.add((uri, "kg:anchorOf", text))
        for t in types:
            out.add((uri, "rdf:type", f"dbo:{t}"))
        if wikidata:
            out.add((uri, "owl:sameAs", wikidata))
        out.add((uri, "kg:category", category))
    return out


def test_triple_precision_recall_vs_reference_goldens(spark):
    out = run_pipeline(
        spark,
        synth.golden_documents(spark),
        synth.golden_lexicon_df(spark),
        # golden URIs have no redirects/sameAs rows -> canonical == raw,
        # matching the reference's raw annotation URIs
        spark.createDataFrame([], "src_uri string, dst_uri string"),
        spark.createDataFrame([], "dbpedia_uri string, wikidata_uri string, wikidata_id string"),
        PipelineConfig(),
    )
    got = {tuple(r) for r in out["triples"].collect()}
    gold = gold_triples()
    tp = len(got & gold)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(gold)
    assert precision >= 0.95, f"precision {precision:.3f} (got-only: {sorted(got - gold)[:5]})"
    assert recall >= 0.95, f"recall {recall:.3f} (missing: {sorted(gold - got)[:5]})"
