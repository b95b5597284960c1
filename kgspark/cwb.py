"""Native Corpus Workbench (CWB) binary-format ingestion.

The reference decodes on-disk CWB corpora in-place through RcppCWB
(R/dbpedia.R:798-811, 885-897); rounds 1-3 consumed an already-tokenized
``(doc_id, cpos, word)`` table and left the binary format as an external
export step. This module closes that gap: it reads the canonical
UNCOMPRESSED CWB binary layout directly — no external tool — and emits the
same token/region tables the rest of the pipeline consumes
(``sources.from_token_table``, ``align``'s J4 cpos->region mapping).

On-disk layout (CWB data directory, one file set per attribute; all
integers int32 BIG-endian, the format's network byte order):

- ``<attr>.corpus``       one lexicon id per corpus position (cpos) —
                          the token fact stream;
- ``<attr>.lexicon``      concatenated NUL-terminated type strings;
- ``<attr>.lexicon.idx``  byte offset of each type string in .lexicon;
- ``<s>.rng``             (start, end) cpos pairs per structural region,
                          end INCLUSIVE, regions sorted + non-overlapping;
- ``<s>_<v>.avs``         concatenated NUL-terminated annotation values;
- ``<s>_<v>.avx``         (region_id, avs_offset) pairs mapping regions
                          to their value strings.

Scale shape: the ``.corpus`` stream at 10^12 tokens is terabytes, so it is
read DISTRIBUTED — ``spark.range(n_cpos)`` yields contiguous cpos
partitions and a ``mapInPandas`` kernel ``seek()+read()``s exactly its
4-byte-aligned slice of the (shared-filesystem) file: a fixed-width record
reader with byte-range splits, the same access pattern Spark's own
columnar readers use. The lexicon is a dim (MBs even at 10M types):
decoded once on the driver and attached as a BROADCAST join. Document
assignment uses the sorted-range property of ``.rng`` — searchsorted over
the broadcast region starts; at 10^9 regions broadcast the starts array
(8 GB) no longer fits and the bucketed range join (``kgspark.align``, J4)
is the drop-in replacement with the same output schema.

Disclosed seam: cwb-huffcode-compressed streams (``.huf``/``.crc``/
``.cnt``) are not decoded — run ``cwb-decompress`` (ships with CWB) first;
same policy as the ffmpeg/PIL codec seams in ``kgspark.multimodal``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

TOKEN_SCHEMA = "cpos long, doc_id long, word_id int"


def _read_nul_strings(data: bytes, offsets: np.ndarray) -> list[str]:
    out = []
    for off in offsets:
        end = data.index(b"\x00", off)
        out.append(data[off:end].decode("utf-8"))
    return out


def read_lexicon(data_dir: str, attr: str = "word") -> list[str]:
    """Decode <attr>.lexicon / .lexicon.idx -> type string per lexicon id."""
    with open(os.path.join(data_dir, f"{attr}.lexicon"), "rb") as f:
        blob = f.read()
    idx = np.fromfile(os.path.join(data_dir, f"{attr}.lexicon.idx"), dtype=">i4")
    return _read_nul_strings(blob, idx)


def read_regions(data_dir: str, s_attr: str = "text") -> np.ndarray:
    """<s>.rng -> (n_regions, 2) array of [start, end] cpos (end inclusive)."""
    rng = np.fromfile(os.path.join(data_dir, f"{s_attr}.rng"), dtype=">i4")
    return rng.reshape(-1, 2).astype(np.int64)


def read_region_values(data_dir: str, s_attr: str, value: str) -> dict[int, str]:
    """<s>_<value>.avx/.avs -> {region_id: value string}."""
    avx = np.fromfile(
        os.path.join(data_dir, f"{s_attr}_{value}.avx"), dtype=">i4"
    ).reshape(-1, 2)
    with open(os.path.join(data_dir, f"{s_attr}_{value}.avs"), "rb") as f:
        blob = f.read()
    strings = _read_nul_strings(blob, avx[:, 1])
    return {int(rid): s for rid, s in zip(avx[:, 0], strings)}


def cwb_token_table(
    spark: SparkSession,
    data_dir: str,
    attr: str = "word",
    s_attr: str = "text",
    parts: int | None = None,
) -> DataFrame:
    """Decode a CWB corpus to the pipeline token table (doc_id, cpos, word).

    ``doc_id`` is the 0-based region index of the ``s_attr`` structural
    attribute (CWB's own document identity); ``cpos`` is CWB's 0-based
    corpus position. ``data_dir`` must be executor-reachable (shared FS on
    a real cluster) — each task opens the .corpus file and reads only its
    own byte range.
    """
    corpus_path = os.path.join(data_dir, f"{attr}.corpus")
    n_cpos = os.path.getsize(corpus_path) // 4
    regions = read_regions(data_dir, s_attr)
    starts = regions[:, 0].copy()
    sc = spark.sparkContext
    b_starts = sc.broadcast(starts)

    def reader(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(corpus_path, "rb") as f:
            for pdf in batches:
                if not len(pdf):
                    continue
                cpos = pdf["id"].to_numpy()
                lo, hi = int(cpos.min()), int(cpos.max())
                f.seek(4 * lo)
                buf = f.read(4 * (hi - lo + 1))
                ids = np.frombuffer(buf, dtype=">i4").astype(np.int32)
                doc = np.searchsorted(b_starts.value, cpos, side="right") - 1
                yield pd.DataFrame(
                    {"cpos": cpos, "doc_id": doc, "word_id": ids[cpos - lo]}
                )

    parts = parts or sc.defaultParallelism
    toks = spark.range(0, n_cpos, 1, parts).mapInPandas(reader, schema=TOKEN_SCHEMA)
    lex = read_lexicon(data_dir, attr)
    lex_df = spark.createDataFrame(
        pd.DataFrame({"word_id": np.arange(len(lex), dtype=np.int32), "word": lex})
    )
    return toks.join(F.broadcast(lex_df), "word_id").select("doc_id", "cpos", "word")


def cwb_documents(
    spark: SparkSession,
    data_dir: str,
    attr: str = "word",
    s_attr: str = "text",
    id_value: str | None = None,
    stoplist: list[str] | None = None,
    parts: int | None = None,
) -> DataFrame:
    """Decode straight to (doc_id[, <id_value>], text) documents — the
    composed S2/S3 path (token decode + stopword drop + reassembly),
    now fed by the native binary reader instead of a pre-exported table."""
    from kgspark.sources import from_token_table

    toks = cwb_token_table(spark, data_dir, attr=attr, s_attr=s_attr, parts=parts)
    docs = from_token_table(toks, stoplist=stoplist)
    if id_value:
        vals = read_region_values(data_dir, s_attr, id_value)
        vals_df = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": list(vals.keys()), id_value: list(vals.values())}
            )
        )
        docs = docs.join(F.broadcast(vals_df), "doc_id", "left")
    return docs


# ---------------------------------------------------------------------------
# Fixture writer — the exact inverse of the reader, used by tests to build
# real on-disk corpora (and by users to round-trip-check an export).
def write_cwb_corpus(
    data_dir: str,
    docs: list[list[str]],
    attr: str = "word",
    s_attr: str = "text",
    id_values: list[str] | None = None,
) -> str:
    """Write token lists as an uncompressed CWB binary corpus."""
    os.makedirs(data_dir, exist_ok=True)
    types: dict[str, int] = {}
    stream: list[int] = []
    ranges: list[tuple[int, int]] = []
    for toks in docs:
        start = len(stream)
        for t in toks:
            if t not in types:
                types[t] = len(types)
            stream.append(types[t])
        ranges.append((start, len(stream) - 1))

    np.asarray(stream, dtype=">i4").tofile(os.path.join(data_dir, f"{attr}.corpus"))
    lex_blob, offsets = b"", []
    for t in types:  # insertion order == id order
        offsets.append(len(lex_blob))
        lex_blob += t.encode("utf-8") + b"\x00"
    with open(os.path.join(data_dir, f"{attr}.lexicon"), "wb") as f:
        f.write(lex_blob)
    np.asarray(offsets, dtype=">i4").tofile(
        os.path.join(data_dir, f"{attr}.lexicon.idx")
    )
    np.asarray(ranges, dtype=">i4").tofile(os.path.join(data_dir, f"{s_attr}.rng"))

    if id_values is not None:
        avs, avx = b"", []
        for rid, v in enumerate(id_values):
            avx.append((rid, len(avs)))
            avs += v.encode("utf-8") + b"\x00"
        with open(os.path.join(data_dir, f"{s_attr}_id.avs"), "wb") as f:
            f.write(avs)
        np.asarray(avx, dtype=">i4").tofile(
            os.path.join(data_dir, f"{s_attr}_id.avx")
        )
    return data_dir
