"""Explicit schemas for every stage boundary.

The reference declares typed empty tables so unions stay well-typed
(``R/dbpedia.R:447-453,790-796``); we do the same with StructTypes.
"""

from pyspark.sql import types as T

# input_hint shape: Common-Crawl-style web pages.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# One row per (doc, segment); seg_off is the 1-based char offset of the
# segment in the original text (reference: names of segment() result,
# R/segment.R:73). keep_from/keep_to encode the midpoint stitching bounds
# (R/dbpedia.R:422-440): a mention survives iff keep_from <= start < keep_to.
SEGMENT_STRUCT = T.StructType(
    [
        T.StructField("seg_off", T.LongType(), False),
        T.StructField("seg_text", T.StringType(), False),
        T.StructField("keep_from", T.DoubleType(), False),
        T.StructField("keep_to", T.DoubleType(), False),
    ]
)
SEGMENTS_ARRAY = T.ArrayType(SEGMENT_STRUCT, False)

# Spotting output: 0-based offset within the spotted string + surface form.
MENTION_STRUCT = T.StructType(
    [
        T.StructField("off0", T.LongType(), False),
        T.StructField("sf", T.StringType(), False),
    ]
)
MENTIONS_ARRAY = T.ArrayType(MENTION_STRUCT, False)

# Core annotation-table IR (reference: R/dbpedia.R:447-453): one row per
# linked entity mention. `types` is the nested per-KB map (R/dbpedia.R:560-577);
# DBpedia_type / Wikidata_type are the pipe-delimited pivots (R/dbpedia.R:579-600).
MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("dbpedia_uri", T.StringType(), False),
        T.StructField("types", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("DBpedia_type", T.StringType(), True),
        T.StructField("Wikidata_type", T.StringType(), True),
    ]
)

LEXICON_SCHEMA = T.StructType(
    [
        T.StructField("surface_form", T.StringType(), False),
        T.StructField("uri", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
        T.StructField("support", T.LongType(), False),
        T.StructField("dbpedia_types", T.ArrayType(T.StringType()), True),
        T.StructField("wikidata_types", T.ArrayType(T.StringType()), True),
        T.StructField("ctx_tokens", T.StringType(), True),
    ]
)

REDIRECTS_SCHEMA = T.StructType(
    [
        T.StructField("src_uri", T.StringType(), False),
        T.StructField("dst_uri", T.StringType(), False),
    ]
)

SAMEAS_SCHEMA = T.StructType(
    [
        T.StructField("dbpedia_uri", T.StringType(), False),
        T.StructField("wikidata_uri", T.StringType(), False),
        T.StructField("wikidata_id", T.StringType(), False),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)
