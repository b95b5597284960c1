"""Input adapters and writeback sinks beyond the parquet/Iceberg scan.

Reference operator coverage (SURVEY §2.1):
- S3  CWB-subcorpus decode -> ``from_token_table``: rebuild document text
  from an indexed token table, dropping per-language stopwords/punctuation
  from the decodable stream (R/dbpedia.R:798-811).
- S4/S5 bundle/corpus sources: collections of documents are just rows of
  the documents DataFrame — the reference's sequential per-doc lapply
  (R/dbpedia.R:954-1021) IS the data parallelism here; no adapter needed.
- S6  XML/TEI source -> ``from_tei``: extract <w>/<pc> token tags with
  @id/@join, reconstruct the text with whitespace rules, compute 1-based
  char offsets by cumulative sum (to_annotation, R/dbpedia.R:159-317).
  Pure-regex pandas kernel (no lxml in this container; the tag grammar the
  reference consumes is regular).
- S9  DBpedia Lookup -> ``lookup``: keyword -> candidate URIs, ranked by
  support (R/dbpedia.R:1331-1381) — an equi-join against the lexicon
  instead of a remote XML API.
- K2  XML enrichment sink -> ``enrich_tei``: write ref attributes back by
  wrapping annotated token runs in <name> elements (R/xml.R:30-209).
- K3  highlight view -> ``highlight_view``: per-category display colors
  (R/utils.R:129-167).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# S3: token table -> documents
def from_token_table(
    tokens: DataFrame,
    stoplist: list[str] | None = None,
    doc_col: str = "doc_id",
    cpos_col: str = "cpos",
    word_col: str = "word",
) -> DataFrame:
    """Rebuild (doc_id, text) from an indexed token stream, excluding
    stoplist tokens (the reference removes stopwords + punctuation before
    shipping text to the annotator, R/dbpedia.R:807-810)."""
    t = tokens
    if stoplist:
        arr = F.array(*[F.lit(s) for s in stoplist])
        t = t.filter(~F.array_contains(arr, F.col(word_col)))
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(cpos_col).alias("c"), F.col(word_col).alias("w")))
        ),
        lambda r: r["w"],
    )
    return t.groupBy(doc_col).agg(F.array_join(ordered, " ").alias("text"))


# ---------------------------------------------------------------------------
# S6: TEI/XML source
_ATTR_RE = re.compile(r'(\w[\w:.-]*)\s*=\s*"([^"]*)"')
_XMLNS_RE = re.compile(r'xmlns(?::([\w.-]+))?\s*=\s*"([^"]*)"')
TEI_NS = "http://www.tei-c.org/ns/1.0"


def _ns_prefix(xml: str) -> str:
    """Resolve the namespace prefix token tags carry, mirroring
    ``namespaced_xpath`` (R/xml.R:219-245): a single declared namespace is
    used as-is; with several, the TEI namespace must be the first declared
    one, otherwise the reference aborts with "Unspecified Namespace".
    Returns '' when tags are unprefixed (no declaration, or a default
    xmlns= declaration)."""
    decls = _XMLNS_RE.findall(xml or "")
    if not decls:
        return ""
    if len(decls) == 1:
        return decls[0][0] or ""
    tei = [i for i, (_, uri) in enumerate(decls) if TEI_NS in uri]
    if tei and tei[0] == 0:
        return decls[0][0] or ""
    raise ValueError("Unspecified Namespace (mirrors R/xml.R:236)")


def _token_tag_re(prefix: str, tags: tuple[str, ...] = ("w", "pc")) -> re.Pattern:
    pfx = re.escape(prefix) + ":" if prefix else ""
    alt = "|".join(tags)
    return re.compile(
        rf"<(?P<tag>{pfx}(?:{alt}))\b(?P<attrs>[^>]*?)(?:/>|>(?P<body>[^<]*)</(?P=tag)\s*>)",
        re.S,
    )


def _feature_tag_re(prefix: str, feature_tag: str) -> re.Pattern:
    pfx = re.escape(prefix) + ":" if prefix else ""
    ft = re.escape(feature_tag)
    return re.compile(
        rf"<{pfx}{ft}\b(?P<attrs>[^>]*)>(?P<body>.*?)</{pfx}{ft}\s*>", re.S
    )

TEI_TOKENS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("token_id", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("word", T.StringType()),
            T.StructField("join", T.StringType()),
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
            T.StructField("cpos", T.LongType()),
        ]
    )
)


def _assign_offsets(toks: list[dict]) -> list[dict]:
    """Whitespace reconstruction + 1-based offset cumsum over an ordered
    token list. Mirrors to_annotation: a token is followed by a space
    unless it (or its successor) carries ``join`` ("right"/"left"/"both")
    — punctuation attaches to the preceding word (R/dbpedia.R:180-213)."""
    out, pos = [], 1
    for i, t in enumerate(toks):
        start = pos
        end = start + len(t["word"]) - 1
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        glue = 0 if (
            nxt is None
            or t["join"] in ("right", "both")
            or (nxt["join"] in ("left", "both"))
            or nxt["tag"] == "pc"
        ) else 1
        pos = end + 1 + glue
        out.append({**t, "start": start, "end": end, "cpos": i + 1})
    return out


_XML_ID_ATTR = "{http://www.w3.org/XML/1998/namespace}id"


def _et_local(tag) -> str | None:
    # Comment/PI nodes carry a callable tag, not a str — skip them.
    if not isinstance(tag, str):
        return None
    return tag.rsplit("}", 1)[-1]


def _parse_tei_et(xml: str, feature_tag: str | None):
    """Structural TEI parse via stdlib ElementTree (the analogue of the
    reference's xml2, R/xml.R:219-245). Handles what the regex kernel
    cannot: nested inline markup inside ``<w>`` bodies
    (``<w><hi>x</hi></w>``), CDATA sections, comments inside sentences,
    and nested same-name feature elements (each feature's children are
    its XML descendants, not a flat position range). Returns
    (tokens, features) or None when the document is not well-formed XML
    (fragment with no single root) — the caller falls back to the regex
    kernel for those.
    """
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return None
    toks: list[dict] = []
    feats: list[dict] = []

    def walk(el, stack):
        lt = _et_local(el.tag)
        if lt is None:
            return
        if lt in ("w", "pc"):
            idx = len(toks)
            toks.append(
                {
                    "token_id": el.get(_XML_ID_ATTR) or el.get("id"),
                    "tag": lt,
                    "word": "".join(el.itertext()).strip(),
                    "join": el.get("join"),
                }
            )
            for rec in stack:
                rec["idx"].append(idx)
            return
        nstack = stack
        if feature_tag is not None and lt == feature_tag:
            rec = {"type": el.get("type"), "ref": el.get("ref"), "idx": []}
            feats.append(rec)
            nstack = stack + [rec]
        for child in el:
            walk(child, nstack)

    walk(root, [])
    toks = _assign_offsets(toks)
    out_feats = []
    for rec in feats:
        children = [toks[i] for i in rec["idx"]]
        if not children:
            continue
        out_feats.append(
            {
                "feature_id": f"{children[0]['token_id']}_{feature_tag}",
                "kind": rec["type"],
                "ref": rec["ref"],
                "start": min(t["start"] for t in children),
                "end": max(t["end"] for t in children),
                "text": " ".join(t["word"] for t in children),
                "token_ids": [t["token_id"] for t in children],
            }
        )
    return toks, out_feats


def _parse_tei_tokens_re(xml: str) -> list[dict]:
    """Regex fallback kernel (round-2 path): accepts rootless fragments
    and bare token streams, but cannot see nested inline markup. Tokens
    carry ``_xmlpos`` so the regex feature pass can range-test them."""
    prefix = _ns_prefix(xml or "")
    toks = []
    for m in _token_tag_re(prefix).finditer(xml or ""):
        attrs = dict(_ATTR_RE.findall(m.group("attrs") or ""))
        word = (m.group("body") or "").strip()
        tag = m.group("tag").split(":", 1)[-1]
        toks.append(
            {
                "token_id": attrs.get("xml:id") or attrs.get("id"),
                "tag": tag,
                "word": word,
                "join": attrs.get("join"),
                "_xmlpos": m.start(),
            }
        )
    return _assign_offsets(toks)


def _parse_tei_features_re(xml: str, tokens: list[dict], feature_tag: str) -> list[dict]:
    prefix = _ns_prefix(xml or "")
    out = []
    for m in _feature_tag_re(prefix, feature_tag).finditer(xml or ""):
        attrs = dict(_ATTR_RE.findall(m.group("attrs") or ""))
        children = [t for t in tokens if m.start() <= t["_xmlpos"] < m.end()]
        if not children:
            continue
        out.append(
            {
                "feature_id": f"{children[0]['token_id']}_{feature_tag}",
                "kind": attrs.get("type"),
                "ref": attrs.get("ref"),
                "start": min(t["start"] for t in children),
                "end": max(t["end"] for t in children),
                "text": " ".join(t["word"] for t in children),
                "token_ids": [t["token_id"] for t in children],
            }
        )
    return out


def parse_tei(xml: str, feature_tag: str | None = None) -> tuple[list[dict], list[dict]]:
    """One-parse TEI extraction: (tokens, features).

    Primary path is real XML parsing (ElementTree); non-well-formed
    fragments fall back to the regex kernel. Both enforce the reference's
    namespace contract first: a multi-namespace document whose first
    declaration is not the TEI namespace aborts with "Unspecified
    Namespace" (R/xml.R:236). Offsets 1-based; join/"pc" whitespace rules
    per R/dbpedia.R:180-213; feature spans per R/dbpedia.R:255-303.
    """
    _ns_prefix(xml or "")  # namespace-contract abort parity, both paths
    parsed = _parse_tei_et(xml or "", feature_tag)
    if parsed is not None:
        return parsed
    toks = _parse_tei_tokens_re(xml or "")
    feats = (
        _parse_tei_features_re(xml or "", toks, feature_tag)
        if feature_tag is not None
        else []
    )
    return toks, feats


def parse_tei_tokens(xml: str) -> list[dict]:
    """<w>/<pc> extraction + whitespace reconstruction + offset cumsum
    (see ``parse_tei``)."""
    return parse_tei(xml)[0]


def parse_tei_features(xml: str, tokens: list[dict], feature_tag: str) -> list[dict]:
    """Pre-annotated feature spans (e.g. ``<name type="...">`` wrapping
    token runs): id = first child token id + '_' + feature_tag, kind =
    @type, span = min/max of the child tokens' char offsets, text = child
    words joined by spaces (to_annotation, R/dbpedia.R:255-303). The
    ``tokens`` argument is used only by the regex fallback; the XML path
    re-derives children structurally."""
    if _parse_tei_et(xml or "", feature_tag) is not None:
        return parse_tei(xml, feature_tag)[1]
    return _parse_tei_features_re(xml or "", tokens, feature_tag)


def reconstruct_tei_text(tokens: list[dict]) -> str:
    buf = []
    for i, t in enumerate(tokens):
        buf.append(t["word"])
        if i + 1 < len(tokens):
            gap = tokens[i + 1]["start"] - (t["end"] + 1)
            buf.append(" " * gap)
    return "".join(buf)


TEI_FEATURES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("feature_id", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("ref", T.StringType()),
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("token_ids", T.ArrayType(T.StringType())),
        ]
    )
)

_TOKEN_FIELDS = [f.name for f in TEI_TOKENS_SCHEMA.elementType.fields]


def from_tei(
    df: DataFrame,
    xml_col: str = "xml",
    doc_col: str = "doc_id",
    feature_tag: str | None = None,
) -> DataFrame:
    """(doc_id, xml) -> (doc_id, text, tokens[, features]). Narrow pandas
    kernel. ``feature_tag`` extracts pre-annotated NE spans (the GermaParl
    vignette path: <name type=...> elements wrapping token runs) alongside
    the token stream, as to_annotation does (R/dbpedia.R:229-303)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_tei(x, feature_tag) for x in pdf[xml_col]]
            toks = [p[0] for p in parsed]
            cols = {
                "doc_id": pdf[doc_col],
                "text": [reconstruct_tei_text(t) for t in toks],
                "tokens": [
                    [{k: t[k] for k in _TOKEN_FIELDS} for t in ts] for ts in toks
                ],
            }
            if feature_tag is not None:
                cols["features"] = [p[1] for p in parsed]
            yield pd.DataFrame(cols)

    fields = [
        T.StructField("doc_id", df.schema[doc_col].dataType),
        T.StructField("text", T.StringType()),
        T.StructField("tokens", TEI_TOKENS_SCHEMA),
    ]
    if feature_tag is not None:
        fields.append(T.StructField("features", TEI_FEATURES_SCHEMA))
    return df.mapInPandas(kernel, T.StructType(fields))


# ---------------------------------------------------------------------------
# K2: TEI enrichment sink
def enrich_tei_document(xml: str, mentions: list[dict], entity_name: str = "name") -> str:
    """Wrap annotated token-id runs in <name ref=...> elements and merge
    ref/type attributes with '|' on conflict (R/xml.R:30-209 semantics,
    regex-based). ``mentions``: dicts with token_ids (list), ref, type."""
    out = xml

    def _ids(m):
        # token_ids may arrive as a numpy array from an Arrow batch, whose
        # truthiness is ambiguous — normalize to a plain list
        v = m.get("token_ids")
        return [] if v is None else list(v)

    for m in sorted(mentions, key=lambda m: -len(_ids(m))):
        ids = _ids(m)
        if not ids:
            continue
        first, last = ids[0], ids[-1]
        token = r'<(?:w|pc)\b[^>]*(?:xml:)?id="{tid}"[^>]*(?:/>|>[^<]*</(?:w|pc)\s*>)'
        if first == last:
            pat = re.compile(f"({token.format(tid=re.escape(first))})", re.S)
        else:
            pat = re.compile(
                rf'(<(?:w|pc)\b[^>]*(?:xml:)?id="{re.escape(first)}".*?'
                + token.format(tid=re.escape(last))
                + ")",
                re.S,
            )
        ref = m.get("ref", "")
        typ = m.get("type")
        attrs = f' ref="{ref}"' + (f' type="{typ}"' if typ else "")
        out, n = pat.subn(rf"<{entity_name}{attrs}>\1</{entity_name}>", out, count=1)
    return out


def enrich_tei(
    df: DataFrame,
    xml_col: str = "xml",
    mentions_col: str = "mentions",
    doc_col: str = "doc_id",
    entity_name: str = "name",
) -> DataFrame:
    """Per-doc reserialization as a pandas kernel (K2 sink). ``mentions``
    is an array of struct(token_ids, ref, type) per document."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[doc_col],
                    "xml": [
                        enrich_tei_document(
                            x, [dict(m) for m in (ms if ms is not None else [])],
                            entity_name=entity_name,
                        )
                        for x, ms in zip(pdf[xml_col], pdf[mentions_col])
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[doc_col].dataType),
            T.StructField("xml", T.StringType()),
        ]
    )
    return df.mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# S9: lexicon lookup
def lookup(lexicon: DataFrame, query: str, max_results: int = 5) -> DataFrame:
    """Keyword -> candidate URIs ranked by support (R/dbpedia.R:1331-1381),
    as a lexicon scan instead of the remote Lookup API."""
    return (
        lexicon.filter(F.lower(F.col("surface_form")).contains(query.lower()))
        .orderBy(F.desc("support"), F.asc("uri"))
        .select("surface_form", "uri", "support")
        .limit(max_results)
    )


# ---------------------------------------------------------------------------
# K3: highlight view
HIGHLIGHT_COLORS = {
    "PERSON": "yellow",
    "LOCATION": "lightgreen",
    "ORGANIZATION": "lightskyblue",
    "MISC": "lightgrey",
}
DEFAULT_HIGHLIGHT = "lavender"


def highlight_view(
    mentions: DataFrame,
    category_col: str = "category",
    uri_col: str = "dbpedia_uri",
) -> DataFrame:
    """The full as_subcorpus annotation payload (R/utils.R:129-167):
    per-category highlight color, href = entity URI, tooltip = URI or
    '[no uri]'. The cpos matrix columns (cpos_left/cpos_right) ride along
    when the caller composed alignment upstream — as_subcorpus requires
    them (R/utils.R:160)."""
    expr = None
    for cat, color in HIGHLIGHT_COLORS.items():
        cond = F.col(category_col) == cat
        expr = F.when(cond, color) if expr is None else expr.when(cond, color)
    out = mentions.withColumn("color", expr.otherwise(DEFAULT_HIGHLIGHT))
    if uri_col in mentions.columns:
        out = out.withColumn("href", F.col(uri_col)).withColumn(
            "tooltip", F.coalesce(F.col(uri_col), F.lit("[no uri]"))
        )
    return out


# ---------------------------------------------------------------------------
# P1/P2/P4/P5: Spotlight JSON response adapter
SPOTLIGHT_JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "Resources",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("@URI", T.StringType()),
                        T.StructField("@surfaceForm", T.StringType()),
                        T.StructField("@offset", T.StringType()),
                        T.StructField("@types", T.StringType()),
                    ]
                )
            ),
        )
    ]
)

SPOTLIGHT_KBS = ("DBpedia", "Wikidata", "Schema", "DUL")


def from_spotlight_json(
    df: DataFrame,
    json_col: str = "json",
    doc_col: str = "doc_id",
    offset: int = 1,
    types_src: tuple[str, ...] = ("DBpedia", "Wikidata"),
    types_drop: bool = False,
) -> DataFrame:
    """Parse DBpedia-Spotlight annotation JSON into the annotation table.

    Pure-expression implementation of the reference's response handling:
    projection + rename of @URI/@surfaceForm/@offset/@types
    (P1, R/dbpedia.R:538-555), 1-based offset rebase (P2, :557), nested
    per-KB types map (P4, :560-577), pipe-wrapped per-KB pivots
    (P5, :579-600), optional types drop (P6, :602). Lets reference users
    replay archived Spotlight responses through this engine.
    """
    parsed = df.withColumn("_p", F.from_json(F.col(json_col), SPOTLIGHT_JSON_SCHEMA))
    res = parsed.select(
        F.col(doc_col).alias("doc_id"),
        F.explode_outer(F.col("_p.Resources")).alias("_r"),
    ).filter(F.col("_r").isNotNull())
    typed = res.select(
        "doc_id",
        (F.col("_r").getField("@offset").cast("long") + F.lit(offset)).alias("start"),
        F.col("_r").getField("@surfaceForm").alias("text"),
        F.col("_r").getField("@URI").alias("dbpedia_uri"),
        F.split(F.col("_r").getField("@types"), ",").alias("_types_raw"),
    )
    def _kb_filter(kb: str):
        # NB: a `lambda t, kb=kb` default-arg closure would make Spark treat
        # the lambda as binary and bind the array INDEX to kb.
        return lambda t: t.startswith(kb + ":")

    per_kb = {
        kb: F.transform(
            F.filter(F.col("_types_raw"), _kb_filter(kb)),
            lambda t: F.substring_index(t, ":", -1),
        )
        for kb in SPOTLIGHT_KBS
    }
    types_map = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(kb) for kb in SPOTLIGHT_KBS]),
            F.array(*[per_kb[kb] for kb in SPOTLIGHT_KBS]),
        ),
        lambda k, v: F.size(v) > 0,
    )
    out = typed.withColumn("types", types_map).drop("_types_raw")
    for kb in types_src:
        arr = F.col("types").getItem(kb)
        out = out.withColumn(
            f"{kb}_type",
            F.when(
                arr.isNotNull() & (F.size(arr) > 0),
                F.concat(F.lit("|"), F.array_join(arr, "|"), F.lit("|")),
            ),
        )
    if types_drop:
        out = out.drop("types")
    return out
