"""Deterministic synthetic inputs: corpus, lexicon, KG dims, golden fixtures.

Everything here is seeded and generated in-process — no external data, no
network (the reference's live-Spotlight test dependency is a weakness we fix,
SURVEY.md §5). Two input families:

1. ``synth_documents`` — Common-Crawl-style pages in the input_hint shape
   ``(url, warc_ts, html:binary, text, lang)``. The ground-truth ``text`` is
   *defined* as the extraction of the generated ``html``, so the
   byte-identity invariant is testable exactly.
2. The driver's star schema at ``/root/testdata`` (word-soup ``documents``
   etc.) — the lexicon below is built over that vocabulary so the KG pipeline
   exercises real ambiguity/overlap on those tables, and every operator can
   be oracle-checked in DuckDB.

The lexicon replaces Spotlight's model files: ``(surface_form, uri, prior,
support, dbpedia_types, wikidata_types, ctx_tokens)`` — the same information
Spotlight's spotter+disambiguator consume (Mendes et al. 2011; surfaced
parameters ``support``/``confidence``/``types`` in ``R/dbpedia.R:366-372``).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from kgspark.extract import extract_text_from_html

# ---------------------------------------------------------------------------
# Vocabulary of the driver-generated documents tables (TESTDATA.md).
VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "group", "part",
    "big", "sort", "query", "fast", "the",
]

# ---------------------------------------------------------------------------
# Lexicon over that vocabulary. Ambiguous forms ("spark", "table", ...),
# nested/overlapping forms ("sort merge join" ⊃ "merge join" ⊃ "join"),
# sub-threshold support rows (< 20 — D3 filter, R/dbpedia.R:372), and
# context token sets that separate the ambiguous candidates (D4).
# Columns: surface_form, uri, prior, support, dbpedia_types, wikidata_types,
#          ctx_tokens (space-joined).
LEXICON_ROWS: list[tuple] = [
    ("spark", "dbr:Apache_Spark", 0.75, 1200, ["Software"], ["Q7397"], "query table stream data batch"),
    ("spark", "dbr:Spark_(fire)", 0.25, 90, ["Thing"], ["Q3196"], "slow line small"),
    ("hash join", "dbr:Hash_join", 0.9, 400, ["Algorithm"], ["Q8366"], "table query row"),
    ("hash join", "dbr:Hash_Join_(band)", 0.1, 15, ["Band"], ["Q215380"], "line"),
    ("join", "dbr:Join_(SQL)", 1.0, 600, ["Software"], ["Q7397"], "table query"),
    ("merge join", "dbr:Sort-merge_join", 1.0, 300, ["Algorithm"], ["Q8366"], "sort order"),
    ("sort merge join", "dbr:Sort-merge_join", 1.0, 280, ["Algorithm"], ["Q8366"], "sort order"),
    ("sort merge", "dbr:Merge_sort", 1.0, 230, ["Algorithm"], ["Q8366"], "batch row"),
    ("merge", "dbr:Merge_algorithm", 0.6, 150, ["Algorithm"], ["Q8366"], "sort batch"),
    ("merge", "dbr:Merge_(village)", 0.4, 45, ["Place", "Location"], ["Q486972"], "small line"),
    ("window", "dbr:Window_function", 0.65, 220, ["Software"], ["Q7397"], "query agg group"),
    ("window", "dbr:Window", 0.35, 800, ["Artifact"], ["Q35473"], "small slow"),
    ("window agg", "dbr:Window_function", 1.0, 210, ["Software"], ["Q7397"], "query group"),
    ("table", "dbr:Table_(database)", 0.55, 500, ["Software"], ["Q7397"], "query column row data"),
    ("table", "dbr:Table_(furniture)", 0.45, 700, ["Artifact"], ["Q14748"], "small big line"),
    ("big table", "dbr:Bigtable", 1.0, 260, ["Software"], ["Q7397"], "data scan"),
    ("stream", "dbr:Stream_processing", 0.7, 180, ["Software"], ["Q7397"], "batch data window"),
    ("stream", "dbr:Stream", 0.3, 900, ["Place", "Location"], ["Q47521"], "line slow small"),
    ("vector", "dbr:Vector_(mathematics)", 0.8, 350, ["Concept"], ["Q44528"], "column data"),
    ("vector", "dbr:Vector_(band)", 0.2, 12, ["Band"], ["Q215380"], "line"),
    ("customer", "dbr:Customer", 1.0, 420, ["Person", "Agent"], ["Q5"], "order value"),
    ("query", "dbr:Query_language", 1.0, 310, ["Software"], ["Q7397"], "table scan filter"),
    ("fast scan", "dbr:Full_table_scan", 1.0, 120, ["Algorithm"], ["Q8366"], "table row"),
    ("scan", "dbr:Image_scanner", 0.5, 95, ["Artifact"], ["Q35473"], "line small"),
    ("scan", "dbr:Full_table_scan", 0.5, 120, ["Algorithm"], ["Q8366"], "table row query"),
    ("sort", "dbr:Sorting_algorithm", 1.0, 500, ["Algorithm"], ["Q8366"], "merge order key"),
    ("key value", "dbr:Key-value_database", 1.0, 140, ["Software"], ["Q7397"], "hash data"),
    ("key", "dbr:Key_(cryptography)", 0.5, 130, ["Concept"], ["Q44528"], "hash"),
    ("key", "dbr:Key_(music)", 0.5, 110, ["Concept"], ["Q44528"], "line"),
    ("value", "dbr:Value_(economics)", 1.0, 170, ["Concept"], ["Q44528"], "order customer"),
    # Staggered (partial-overlap) pairs — words deliberately absent from
    # every other surface form, so wherever the corpus emits the trigram
    # "order column part" / "order filter small" the two bigram mentions
    # overlap WITHOUT containment: the A4 outer/inner synthesis path
    # (overlap_synthesis query) gets real rows. Same uri on the first pair
    # (-> 'ovl_partial'), distinct uris on the second
    # (-> 'ovl_partial|ovl_distinct' + the |ovl_multiple synth variants).
    ("order column", "dbr:Column_ordering", 1.0, 350, ["Software"], ["Q7397"], "table sort"),
    ("column part", "dbr:Column_ordering", 1.0, 340, ["Software"], ["Q7397"], "table sort"),
    ("order filter", "dbr:Filter_ordering", 1.0, 330, ["Software"], ["Q7397"], "query scan"),
    ("filter small", "dbr:Small_filter", 1.0, 320, ["Algorithm"], ["Q8366"], "query scan"),
    ("group", "dbr:Grouping", 1.0, 60, ["Concept"], ["Q44528"], "agg key"),
]

# Redirect chains (2-hop to exercise fixpoint closure — FIXTURES.md §3).
REDIRECT_ROWS: list[tuple[str, str]] = [
    ("dbr:Sort-merge_join", "dbr:Sort_merge_join"),
    ("dbr:Sort_merge_join", "dbr:Merge_join_algorithm"),
    ("dbr:Stream", "dbr:Stream_(hydrology)"),
    ("dbr:Bigtable", "dbr:Google_Bigtable"),
    ("dbr:Grouping", "dbr:Group_(mathematics)"),
]

# owl:sameAs dimension (reference fetches this per-chunk over SPARQL,
# R/wikidata.R:72-78,307-340; we materialize it as a static dim table).
# Some canonical URIs intentionally have no row (left-join null path).
SAMEAS_ROWS: list[tuple[str, str, str]] = [
    ("dbr:Apache_Spark", "http://www.wikidata.org/entity/Q28925043", "Q28925043"),
    ("dbr:Hash_join", "http://www.wikidata.org/entity/Q5675345", "Q5675345"),
    ("dbr:Join_(SQL)", "http://www.wikidata.org/entity/Q2619152", "Q2619152"),
    ("dbr:Merge_join_algorithm", "http://www.wikidata.org/entity/Q3316977", "Q3316977"),
    ("dbr:Merge_sort", "http://www.wikidata.org/entity/Q420699", "Q420699"),
    ("dbr:Merge_algorithm", "http://www.wikidata.org/entity/Q1921156", "Q1921156"),
    ("dbr:Window_function", "http://www.wikidata.org/entity/Q11187099", "Q11187099"),
    ("dbr:Table_(database)", "http://www.wikidata.org/entity/Q278425", "Q278425"),
    ("dbr:Google_Bigtable", "http://www.wikidata.org/entity/Q2342365", "Q2342365"),
    ("dbr:Stream_processing", "http://www.wikidata.org/entity/Q2006448", "Q2006448"),
    ("dbr:Stream_(hydrology)", "http://www.wikidata.org/entity/Q47521", "Q47521"),
    ("dbr:Vector_(mathematics)", "http://www.wikidata.org/entity/Q44528", "Q44528"),
    ("dbr:Customer", "http://www.wikidata.org/entity/Q852835", "Q852835"),
    ("dbr:Full_table_scan", "http://www.wikidata.org/entity/Q5508281", "Q5508281"),
    ("dbr:Sorting_algorithm", "http://www.wikidata.org/entity/Q181593", "Q181593"),
    ("dbr:Key-value_database", "http://www.wikidata.org/entity/Q6398424", "Q6398424"),
    ("dbr:Value_(economics)", "http://www.wikidata.org/entity/Q194112", "Q194112"),
]

# Wikidata property labels (reference: wikidata_query, R/wikidata.R:187-235).
LABEL_ROWS: list[tuple[str, str, str, str]] = [
    ("Q28925043", "Apache Spark", "P31", "instance of"),
    ("Q28925043", "Apache Spark", "P178", "developer"),
    ("Q5675345", "hash join", "P31", "instance of"),
    ("Q3316977", "sort-merge join", "P31", "instance of"),
    ("Q278425", "table", "P31", "instance of"),
    ("Q2342365", "Bigtable", "P178", "developer"),
    ("Q2006448", "stream processing", "P31", "instance of"),
    ("Q181593", "sorting algorithm", "P31", "instance of"),
]

# Per-language stopword lists + disjoint language-marker sets live in
# kgspark.stopwords (S11 — mirrors the reference's model-quickstarter
# lists, data-raw/stopwords.R:1-24); re-exported here because the DuckDB
# oracle and the corpus generator key on them.
from kgspark.stopwords import LANG_MARKERS, STOPWORDS, stopwords_for  # noqa: F401

EN_STOPWORDS = STOPWORDS["en"]

# ---------------------------------------------------------------------------
# Golden fixture docs + mini-lexicon reproducing the reference's unit-test
# scenarios (tests/testthat/test-detect_overlaps.R, test-categorize_overlaps.R,
# test-entity_types_map.R; one-liner docs listed in FIXTURES.md §1).
GOLDEN_DOCS: list[tuple[str, str, str]] = [
    ("g1", "Vice President Gore in Washington D.C.", "en"),
    ("g2", "Crude oil prices on the rise.", "en"),
    ("g3", "Berlin is the capital of Germany.", "en"),
    ("g4", "Der Deutsche Bundestag tagt in Berlin.", "de"),
]

GOLDEN_LEXICON_ROWS: list[tuple] = [
    ("Vice President Gore", "dbr:Al_Gore", 1.0, 900, ["Person", "Agent", "OfficeHolder"], ["Q5"], "Washington President"),
    ("Gore", "dbr:Al_Gore", 0.8, 900, ["Person", "Agent", "OfficeHolder"], ["Q5"], "Washington President Vice"),
    ("Gore", "dbr:Gore,_Virginia", 0.2, 40, ["Place", "Location"], ["Q486972"], "Virginia"),
    ("Washington D.C.", "dbr:Washington,_D.C.", 1.0, 2000, ["Place", "Location", "City"], ["Q515"], "President capital"),
    ("Crude oil", "dbr:Petroleum", 1.0, 1500, ["ChemicalSubstance"], ["Q42962"], "prices barrel"),
    ("oil prices", "dbr:Price_of_oil", 1.0, 300, [], ["Q7206978"], "rise barrel"),
    ("Berlin", "dbr:Berlin", 0.9, 3000, ["Place", "Location", "City"], ["Q515"], "capital Germany Bundestag"),
    ("Berlin", "dbr:Berlin_(band)", 0.1, 60, ["Band"], ["Q215380"], "music"),
    ("capital", "dbr:Capital_city", 1.0, 800, [], ["Q5119"], "Germany Berlin"),
    ("Germany", "dbr:Germany", 1.0, 5000, ["Place", "Location", "Country"], ["Q6256"], "Berlin capital"),
    ("Deutsche Bundestag", "dbr:Bundestag", 1.0, 700, ["Organisation", "Legislature"], ["Q11204"], "Berlin tagt"),
    ("Bundestag", "dbr:Bundestag", 1.0, 700, ["Organisation", "Legislature"], ["Q11204"], "Berlin tagt Deutsche"),
]


# ---------------------------------------------------------------------------
# Big generated lexicon (scale-path exercises: the 31-row lexicon above is
# for oracle-pinned correctness; this one sizes the automaton/artifact path
# like a real Spotlight lexicon).
def big_lexicon_forms(n: int = 100_000) -> list[str]:
    """n deterministic, mostly-prefix-diverse surface forms (vocab word +
    md5 suffix — ~6 trie states per form, like real-world entity names)."""
    import hashlib

    return [
        f"{VOCAB[i % len(VOCAB)]} {hashlib.md5(str(i).encode()).hexdigest()[:8]}"
        for i in range(n)
    ]


def big_lexicon_df(spark, n: int = 100_000):
    """Full lexicon rows for the generated forms (every form unambiguous;
    the point is automaton/join scale, not disambiguation)."""
    from kgspark.schemas import LEXICON_SCHEMA

    rows = [
        (sf, f"dbr:Gen_{i}", 1.0, 100 + (i % 900), ["Thing"], ["Q35120"], "data")
        for i, sf in enumerate(big_lexicon_forms(n))
    ]
    # keep the real forms too so the spotting result is non-trivial
    return spark.createDataFrame(rows + LEXICON_ROWS, LEXICON_SCHEMA)


# ---------------------------------------------------------------------------
# HTML builder. The Python and SQL builders MUST stay in lockstep: the SQL
# variant is used by the DuckDB oracle (and Spark SQL) to synthesize the same
# bytes from the testdata `documents.text` column, so the extract stage can
# be verified by value-hash equality with `SELECT text FROM documents`.
_HTML_PREFIX = (
    '<html><head><title>doc-{key}</title><script>var a=1;</script>'
    "<style>.x{{color:red}}</style></head><body>"
    '<nav><a href="/">home</a> | <a href="/about">about</a></nav>'
    "<header>CommonCrawl-ish fixture</header><article>"
)
_HTML_SUFFIX = "</article><footer>(c) 2026 kgspark</footer></body></html>"


def html_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_html(text: str, key: str | int) -> bytes:
    """text (paragraphs separated by \\n) -> full page bytes."""
    pars = text.split("\n")
    body = "".join(f"<p>{html_escape(p)}</p>" for p in pars)
    return (_HTML_PREFIX.format(key=key) + body + _HTML_SUFFIX).encode("utf-8")


def html_sql_expr(text_expr: str, key_expr: str) -> str:
    """SQL expression (DuckDB + Spark SQL shared dialect) building the same
    single-paragraph page string as ``build_html`` for newline-free text."""
    esc = (
        f"replace(replace(replace({text_expr}, '&', '&amp;'), '<', '&lt;'), "
        f"'>', '&gt;')"
    )
    prefix = _HTML_PREFIX.replace("{{", "{").replace("}}", "}").split("{key}")
    return (
        f"'{prefix[0]}' || cast({key_expr} as string) || '{prefix[1]}' || "
        f"'<p>' || {esc} || '</p>' || '{_HTML_SUFFIX}'"
    )


# ---------------------------------------------------------------------------
# Seeded synthetic corpus in the input_hint shape.
def synth_corpus_pdf(
    n_docs: int = 200,
    seed: int = 42,
    long_doc_every: int = 23,
    long_doc_words: int = 900,
    min_words: int = 40,
    max_words: int = 120,
) -> pd.DataFrame:
    """Deterministic pandas frame (url, warc_ts, html, text, lang).

    Word-soup text over VOCAB; every ``long_doc_every``-th doc is long enough
    to trip segmentation at the test thresholds; a handful of docs embed the
    golden one-liners; ~4% exact duplicates (dedup targets).
    """
    rng = np.random.RandomState(seed)
    rows = []
    base_ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
    langs = ["en", "en", "en", "de", "es", "fr", "zh"]
    prev_texts: list[str] = []
    for i in range(n_docs):
        lang = langs[int(rng.randint(0, len(langs)))]
        if i % long_doc_every == 5:
            n_words = long_doc_words
        else:
            n_words = int(rng.randint(min_words, max_words))
        words = [VOCAB[int(k)] for k in rng.randint(0, len(VOCAB), size=n_words)]
        # sprinkle language markers so lang-id has signal
        markers = LANG_MARKERS[lang]
        for _ in range(max(2, n_words // 20)):
            words[int(rng.randint(0, n_words))] = markers[int(rng.randint(0, len(markers)))]
        if prev_texts and rng.rand() < 0.04:
            text = prev_texts[int(rng.randint(0, len(prev_texts)))]  # exact dup
        else:
            n_pars = int(rng.randint(1, 4))
            cuts = sorted(rng.choice(np.arange(1, n_words), size=n_pars - 1, replace=False)) if n_pars > 1 else []
            pars, prev = [], 0
            for c in list(cuts) + [n_words]:
                pars.append(" ".join(words[prev:c]))
                prev = c
            text = "\n".join(p for p in pars if p)
            prev_texts.append(text)
        url = f"https://example.org/doc/{i}"
        html = build_html(text, i)
        # ground truth text IS the extraction of the page (byte-identity).
        gt = extract_text_from_html(html)
        assert gt == text, f"generator/extractor out of sync for doc {i}"
        rows.append((url, base_ts + _dt.timedelta(seconds=i), html, gt, lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synth_documents(spark, n_docs: int = 200, seed: int = 42, **kwargs):
    from kgspark.schemas import DOCUMENTS_SCHEMA

    return spark.createDataFrame(
        synth_corpus_pdf(n_docs=n_docs, seed=seed, **kwargs), DOCUMENTS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Distributed synthesis: per-doc-independent seeding so each executor
# generates its own partition of the corpus (the driver-side pandas loop
# above caps out ~10^5 docs; bench/scaling corpora need 10^5-10^6+).
_LANG_CYCLE = ["en", "en", "en", "de", "es", "fr", "zh"]


def _doc_rng(i: int, seed: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + i * 2_654_435_761) % (2**31 - 1))


def _gen_base_text(i: int, seed: int, long_doc_every: int, long_doc_words: int,
                   min_words: int, max_words: int) -> tuple[str, str]:
    """(text, lang) for doc i, ignoring duplication — a pure function of
    (i, seed) so duplicate docs can recompute their source text locally."""
    rng = _doc_rng(i, seed)
    lang = _LANG_CYCLE[int(rng.randint(0, len(_LANG_CYCLE)))]
    n_words = long_doc_words if i % long_doc_every == 5 else int(
        rng.randint(min_words, max_words)
    )
    words = [VOCAB[int(k)] for k in rng.randint(0, len(VOCAB), size=n_words)]
    markers = LANG_MARKERS[lang]
    for _ in range(max(2, n_words // 20)):
        words[int(rng.randint(0, n_words))] = markers[int(rng.randint(0, len(markers)))]
    n_pars = int(rng.randint(1, 4))
    cuts = (
        sorted(rng.choice(np.arange(1, n_words), size=n_pars - 1, replace=False))
        if n_pars > 1
        else []
    )
    pars, prev = [], 0
    for c in list(cuts) + [n_words]:
        pars.append(" ".join(words[prev:c]))
        prev = c
    return "\n".join(p for p in pars if p), lang


def gen_doc_row(i: int, seed: int = 42, long_doc_every: int = 23,
                long_doc_words: int = 900, min_words: int = 40,
                max_words: int = 120, dup_rate: float = 0.04) -> tuple:
    rng = _doc_rng(~i & 0x7FFFFFFF, seed)  # separate stream for dup routing
    if i > 0 and rng.rand() < dup_rate:
        src = int(rng.randint(0, i))
        text, _ = _gen_base_text(src, seed, long_doc_every, long_doc_words,
                                 min_words, max_words)
        lang = _gen_base_text(i, seed, long_doc_every, long_doc_words,
                              min_words, max_words)[1]
    else:
        text, lang = _gen_base_text(i, seed, long_doc_every, long_doc_words,
                                    min_words, max_words)
    html = build_html(text, i)
    gt = extract_text_from_html(html)
    assert gt == text, f"generator/extractor out of sync for doc {i}"
    base_ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
    return (
        f"https://example.org/doc/{i}",
        base_ts + _dt.timedelta(seconds=i),
        html,
        gt,
        lang,
    )


def synth_documents_distributed(spark, n_docs: int, seed: int = 42,
                                parts: int | None = None, **kwargs):
    """Executor-side corpus generation via mapInPandas over spark.range —
    the input_hint-shaped table at bench scale without a driver loop."""
    from kgspark.schemas import DOCUMENTS_SCHEMA

    cols = ["url", "warc_ts", "html", "text", "lang"]
    ids = spark.range(
        0, n_docs, 1, parts or spark.sparkContext.defaultParallelism * 2
    )

    def kernel(batches):
        for pdf in batches:
            rows = [gen_doc_row(int(i), seed, **kwargs) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return ids.mapInPandas(kernel, DOCUMENTS_SCHEMA)


def golden_documents(spark):
    from kgspark.schemas import DOCUMENTS_SCHEMA

    base_ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
    rows = [
        (f"golden://{doc_id}", base_ts, build_html(text, doc_id), text, lang)
        for doc_id, text, lang in GOLDEN_DOCS
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]), DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# Dimension DataFrames (broadcast-sized).
def lexicon_df(spark, rows: list[tuple] | None = None):
    from kgspark.schemas import LEXICON_SCHEMA

    return spark.createDataFrame(rows or LEXICON_ROWS, LEXICON_SCHEMA)


def golden_lexicon_df(spark):
    return lexicon_df(spark, GOLDEN_LEXICON_ROWS)


def redirects_df(spark):
    from kgspark.schemas import REDIRECTS_SCHEMA

    return spark.createDataFrame(REDIRECT_ROWS, REDIRECTS_SCHEMA)


def sameas_df(spark):
    from kgspark.schemas import SAMEAS_SCHEMA

    return spark.createDataFrame(SAMEAS_ROWS, SAMEAS_SCHEMA)


def labels_df(spark):
    return spark.createDataFrame(
        LABEL_ROWS, "wikidata_id string, label string, prop_id string, prop_label string"
    )
