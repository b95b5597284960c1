"""WARC (Web ARChive, ISO 28500) ingestion — the container a real crawl
ships in (the reference consumes pre-extracted text; the `input_hint`
documents table is what a WARC crawl becomes after this module).

Format: a WARC file is a sequence of records; each record is a header
block (``WARC/1.0`` version line + ``Name: value`` lines, CRLF
terminated, blank line) followed by ``Content-Length`` payload bytes and
``CRLF CRLF``. Uncompressed WARC is parsed natively here; per-record-gzip
WARC (.warc.gz with one gzip member per record) is handled by whole-file
gunzip when the file is a single stream, else disclosed as a seam (the
production layout keeps files at task size anyway).

Scale shape: WARC records are variable-length, so the SPLIT UNIT is the
file, not a byte range — exactly how crawl archives are laid out (CC
ships ~1 GB files; one task per file). ``spark.read.format("binaryFile")``
lists the files into partitions and a ``mapInPandas`` kernel walks each
file's records; no driver-side parsing, no collect. The writer is the
inverse: one WARC file per partition via ``foreachPartition``-free
``mapInPandas`` (each task writes its own file — the idempotent
task-output pattern; at 10^12 docs swap the local filesystem for the
Hadoop FileSystem API as in ``kgspark/lineage.py``).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

CRLF = b"\r\n"
WARC_OUT_SCHEMA = "url string, warc_ts string, record_type string, payload binary"


def build_warc_record(
    url: str, ts: str, payload: bytes, record_type: str = "response"
) -> bytes:
    """One WARC/1.0 record (header block + payload + record separator)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + record_type.encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + ts.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return CRLF.join(headers) + CRLF + CRLF + payload + CRLF + CRLF


def build_warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    return b"".join(build_warc_record(u, t, p) for u, t, p in records)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All records of one WARC file. Pure function — unit-testable and
    reused verbatim by the distributed reader kernel."""
    if data[:2] == b"\x1f\x8b":  # gzip magic: concatenated-member streams
        data = gzip.decompress(data)  # gzip module reads ALL members
    out = []
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.index(CRLF + CRLF, pos)
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}: {lines[0]!r}")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields["content-length"])
        body_start = head_end + 4
        out.append(
            {
                "url": fields.get("warc-target-uri", ""),
                "warc_ts": fields.get("warc-date", ""),
                "record_type": fields.get("warc-type", ""),
                "payload": data[body_start : body_start + length],
            }
        )
        pos = body_start + length
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: one task per file (the crawl-archive split
    unit), records parsed by an Arrow-batched kernel. Returns
    (url, warc_ts, record_type, payload)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "record_type", "payload"]
            )

    return files.select("content").mapInPandas(parse, WARC_OUT_SCHEMA)


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "payload",
) -> None:
    """One WARC file per partition, written by the task that owns the
    rows (no driver collect). Deterministic names via the partition id."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        n = 0
        for pdf in batches:
            for u, t, p in zip(pdf[url_col], pdf[ts_col], pdf[payload_col]):
                buf.write(build_warc_record(str(u), str(t), bytes(p)))
                n += 1
        if n:
            with open(os.path.join(out_dir, f"part-{pid:05d}.warc"), "wb") as fh:
                fh.write(buf.getvalue())
        yield pd.DataFrame({"partition": [pid], "n_records": [n]})

    # the count() action drives the writes; the returned frame is the
    # per-task manifest
    df.select(url_col, ts_col, payload_col).mapInPandas(
        dump, "partition int, n_records long"
    ).count()
