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

Huffcode-compressed token streams (round-5): CWB ships corpora with the
``.corpus`` stream replaced by three components (cwb-huffcode):

- ``<attr>.hcd``      Huffman Code Descriptor — network-order int32s:
                      size (n tokens), length (n symbols), min_codelen,
                      max_codelen, lcount[MAXCODELEN] (codes per length),
                      symindex[MAXCODELEN] (first symbol per length),
                      min_code[MAXCODELEN] (smallest code per length),
                      then symbols[length] (lexicon ids ordered by code);
- ``<attr>.huf``      the canonical-Huffman bit stream, MSB-first;
- ``<attr>.huf.syn``  synchronization index — one int32 offset per
                      SYNCHRONIZATION(=64)-token block, so random access
                      decodes at most 63 extra symbols.

The code is CWB's canonical flavor (codes DESCEND with length:
``min_code[l] = (min_code[l+1] + lcount[l+1]) >> 1``), so the decode walk
is ``while v < min_code[l]: v = (v << 1) | next_bit; l += 1`` and the
symbol is ``symbols[symindex[l] + v - min_code[l]]``. Sync blocks are
byte-aligned here (each block zero-padded to a byte boundary; ``.syn``
stores BYTE offsets) — the one layout convention this sandbox cannot
adjudicate against a real cwb-huffcode binary (none installed); it is an
explicit constant below and a one-line change if a real corpus disagrees.
The distributed reader splits on sync blocks exactly as the uncompressed
reader splits on byte ranges.
"""

from __future__ import annotations

import heapq
import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

TOKEN_SCHEMA = "cpos long, doc_id long, word_id int"

MAXCODELEN = 32  # CWB cl: longest admissible Huffman code
SYNCHRONIZATION = 64  # tokens per sync block (cwb-huffcode)


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


# ---------------------------------------------------------------------------
# Huffcode-compressed token streams (.hcd / .huf / .huf.syn)


@dataclass
class HCD:
    """Huffman Code Descriptor (CWB's canonical-code tables)."""

    size: int  # number of tokens in the stream
    min_codelen: int
    max_codelen: int
    lcount: np.ndarray  # codes per length, index 0..MAXCODELEN-1
    symindex: np.ndarray  # first symbols[] index per length
    min_code: np.ndarray  # numerically smallest code per length
    symbols: np.ndarray  # lexicon ids in code order


def _huffman_code_lengths(freqs: np.ndarray) -> np.ndarray:
    """Code length per symbol for positive frequencies (plain Huffman)."""
    n = len(freqs)
    if n == 1:
        return np.ones(1, dtype=np.int64)
    heap = [(int(f), i) for i, f in enumerate(freqs)]
    heapq.heapify(heap)
    parent = np.full(2 * n - 1, -1, dtype=np.int64)
    nxt = n
    while len(heap) > 1:
        f1, a = heapq.heappop(heap)
        f2, b = heapq.heappop(heap)
        parent[a] = parent[b] = nxt
        heapq.heappush(heap, (f1 + f2, nxt))
        nxt += 1
    depth = np.zeros(nxt, dtype=np.int64)
    for node in range(nxt - 2, -1, -1):  # parents precede children in reverse
        depth[node] = depth[parent[node]] + 1
    lengths = depth[:n]
    # table arrays are indexed by length 0..MAXCODELEN-1 on disk
    if lengths.max() > MAXCODELEN - 1:
        raise ValueError(f"Huffman code exceeds MAXCODELEN-1={MAXCODELEN - 1}")
    return lengths


def _canonical_tables(ids_present: np.ndarray, lengths: np.ndarray) -> HCD:
    """CWB-flavor canonical code: codes of length l occupy
    [min_code[l], min_code[l]+lcount[l]), and every shorter code is
    numerically LARGER than any longer code's prefix — hence the decoder's
    `while v < min_code[l]` extension walk."""
    max_l, min_l = int(lengths.max()), int(lengths.min())
    lcount = np.zeros(MAXCODELEN + 1, dtype=np.int64)
    for l in lengths:
        lcount[l] += 1
    min_code = np.zeros(MAXCODELEN + 2, dtype=np.int64)
    for l in range(max_l - 1, min_l - 1, -1):
        s = min_code[l + 1] + lcount[l + 1]
        assert s % 2 == 0, "Kraft violation: not a complete Huffman code"
        min_code[l] = s >> 1
    symindex = np.zeros(MAXCODELEN + 1, dtype=np.int64)
    acc = 0
    for l in range(0, MAXCODELEN + 1):
        symindex[l] = acc
        acc += lcount[l]
    order = np.lexsort((ids_present, lengths))  # by (length, id)
    return HCD(
        size=0,
        min_codelen=min_l,
        max_codelen=max_l,
        lcount=lcount[:MAXCODELEN],
        symindex=symindex[:MAXCODELEN],
        min_code=min_code[:MAXCODELEN],
        symbols=ids_present[order],
    )


def write_hcd(path: str, hcd: HCD) -> None:
    with open(path, "wb") as f:
        np.asarray(
            [hcd.size, len(hcd.symbols), hcd.min_codelen, hcd.max_codelen],
            dtype=">i4",
        ).tofile(f)
        np.asarray(hcd.lcount, dtype=">i4").tofile(f)
        np.asarray(hcd.symindex, dtype=">i4").tofile(f)
        np.asarray(hcd.min_code, dtype=">i4").tofile(f)
        np.asarray(hcd.symbols, dtype=">i4").tofile(f)


def read_hcd(path: str) -> HCD:
    raw = np.fromfile(path, dtype=">i4").astype(np.int64)
    size, length, min_l, max_l = (int(x) for x in raw[:4])
    off = 4
    lcount = raw[off : off + MAXCODELEN]
    off += MAXCODELEN
    symindex = raw[off : off + MAXCODELEN]
    off += MAXCODELEN
    min_code = raw[off : off + MAXCODELEN]
    off += MAXCODELEN
    symbols = raw[off : off + length]
    return HCD(size, min_l, max_l, lcount, symindex, min_code, symbols)


def compress_cwb_stream(
    ids: np.ndarray, data_dir: str, attr: str = "word"
) -> None:
    """cwb-huffcode equivalent: encode a lexicon-id stream to
    .hcd/.huf/.huf.syn (sync blocks byte-aligned, .syn = byte offsets)."""
    ids = np.asarray(ids, dtype=np.int64)
    present, inv_freq = np.unique(ids, return_counts=True)
    lengths = _huffman_code_lengths(inv_freq)
    hcd = _canonical_tables(present, lengths)
    hcd.size = len(ids)
    # code per lexicon id: min_code[l] + rank within the length class,
    # ranks following symbols[] order (the decoder's source of truth)
    code_of = {}
    for l in range(hcd.min_codelen, hcd.max_codelen + 1):
        start = hcd.symindex[l]
        for r in range(int(hcd.lcount[l])):
            sym = int(hcd.symbols[start + r])
            code_of[sym] = (int(hcd.min_code[l]) + r, l)
    bits = bytearray()
    syn: list[int] = []
    acc, nbits = 0, 0
    for i, sym in enumerate(ids):
        if i % SYNCHRONIZATION == 0:
            if nbits:  # pad the previous block to a byte boundary
                bits.append((acc << (8 - nbits)) & 0xFF)
                acc, nbits = 0, 0
            syn.append(len(bits))
        c, l = code_of[int(sym)]
        acc = (acc << l) | c
        nbits += l
        while nbits >= 8:
            nbits -= 8
            bits.append((acc >> nbits) & 0xFF)
    if nbits:
        bits.append((acc << (8 - nbits)) & 0xFF)
    write_hcd(os.path.join(data_dir, f"{attr}.hcd"), hcd)
    with open(os.path.join(data_dir, f"{attr}.huf"), "wb") as f:
        f.write(bytes(bits))
    np.asarray(syn, dtype=">i4").tofile(os.path.join(data_dir, f"{attr}.huf.syn"))


def decode_block(data: bytes, n_items: int, hcd: HCD) -> np.ndarray:
    """Decode `n_items` canonical codes from a byte-aligned block."""
    acc = int.from_bytes(data, "big")
    total = len(data) * 8
    mc, si, sym = hcd.min_code, hcd.symindex, hcd.symbols
    out = np.empty(n_items, dtype=np.int32)
    pos = 0
    for i in range(n_items):
        l = hcd.min_codelen
        v = (acc >> (total - pos - l)) & ((1 << l) - 1)
        while v < mc[l]:
            l += 1
            v = (v << 1) | ((acc >> (total - pos - l)) & 1)
        out[i] = sym[si[l] + v - mc[l]]
        pos += l
    return out


def cwb_token_table_compressed(
    spark: SparkSession,
    data_dir: str,
    attr: str = "word",
    s_attr: str = "text",
    parts: int | None = None,
) -> DataFrame:
    """Distributed decode of a huffcode-compressed corpus: sync blocks are
    the split unit (each task seeks to its blocks' byte offset and decodes
    only those), mirroring the uncompressed reader's byte-range splits.
    The .syn index and HCD tables are dims (n_cpos/64 int32s and the
    lexicon-sized code table) — broadcast, like the lexicon itself."""
    huf_path = os.path.join(data_dir, f"{attr}.huf")
    hcd = read_hcd(os.path.join(data_dir, f"{attr}.hcd"))
    syn = np.fromfile(
        os.path.join(data_dir, f"{attr}.huf.syn"), dtype=">i4"
    ).astype(np.int64)
    n_cpos = hcd.size
    n_blocks = len(syn)
    huf_size = os.path.getsize(huf_path)
    regions = read_regions(data_dir, s_attr)
    sc = spark.sparkContext
    b = sc.broadcast((hcd, syn, regions[:, 0].copy(), n_cpos, huf_size))

    def reader(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hcd_, syn_, starts, n_cpos_, huf_size_ = b.value
        with open(huf_path, "rb") as f:
            for pdf in batches:
                if not len(pdf):
                    continue
                blocks = pdf["id"].to_numpy()
                lo, hi = int(blocks.min()), int(blocks.max())
                end = int(syn_[hi + 1]) if hi + 1 < len(syn_) else huf_size_
                f.seek(int(syn_[lo]))
                buf = f.read(end - int(syn_[lo]))
                cpos_all, ids_all = [], []
                for blk in range(lo, hi + 1):
                    b0 = int(syn_[blk]) - int(syn_[lo])
                    b1 = (
                        int(syn_[blk + 1]) - int(syn_[lo])
                        if blk + 1 < len(syn_)
                        else len(buf)
                    )
                    n_items = min(SYNCHRONIZATION, n_cpos_ - blk * SYNCHRONIZATION)
                    ids = decode_block(buf[b0:b1], n_items, hcd_)
                    cpos = np.arange(
                        blk * SYNCHRONIZATION,
                        blk * SYNCHRONIZATION + n_items,
                        dtype=np.int64,
                    )
                    cpos_all.append(cpos)
                    ids_all.append(ids)
                cpos = np.concatenate(cpos_all)
                ids = np.concatenate(ids_all)
                doc = np.searchsorted(starts, cpos, side="right") - 1
                yield pd.DataFrame({"cpos": cpos, "doc_id": doc, "word_id": ids})

    parts = parts or sc.defaultParallelism
    toks = spark.range(0, n_blocks, 1, min(parts, n_blocks)).mapInPandas(
        reader, schema=TOKEN_SCHEMA
    )
    lex = read_lexicon(data_dir, attr)
    lex_df = spark.createDataFrame(
        pd.DataFrame({"word_id": np.arange(len(lex), dtype=np.int32), "word": lex})
    )
    return toks.join(F.broadcast(lex_df), "word_id").select("doc_id", "cpos", "word")


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
    own byte range. Huffcode-compressed corpora (no ``.corpus``, but
    ``.huf``/``.hcd``/``.huf.syn`` present) are decoded natively via
    ``cwb_token_table_compressed``.
    """
    corpus_path = os.path.join(data_dir, f"{attr}.corpus")
    if not os.path.exists(corpus_path) and os.path.exists(
        os.path.join(data_dir, f"{attr}.huf")
    ):
        return cwb_token_table_compressed(
            spark, data_dir, attr=attr, s_attr=s_attr, parts=parts
        )
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
    compressed: bool = False,
) -> str:
    """Write token lists as a CWB binary corpus — uncompressed ``.corpus``
    by default, or the huffcode triple (``.hcd``/``.huf``/``.huf.syn``,
    no ``.corpus``) with ``compressed=True``, like cwb-huffcode's
    delete-the-original workflow."""
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

    if compressed:
        compress_cwb_stream(np.asarray(stream, dtype=np.int64), data_dir, attr)
    else:
        np.asarray(stream, dtype=">i4").tofile(
            os.path.join(data_dir, f"{attr}.corpus")
        )
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
