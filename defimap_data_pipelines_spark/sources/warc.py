"""WARC crawl-archive ingestion (stdlib-only parser).

Web-crawl corpora (the 100 TB training-data source) ship as WARC
containers: concatenated records, each a ``WARC/1.x`` version line,
CRLF header block, CRLF CRLF, ``Content-Length`` bytes of payload,
CRLF CRLF. This module reads WARC files through Spark's ``binaryFile``
source and splits records with a pure-Python byte walker inside
Arrow-batched ``mapInPandas`` — the same tiered-codec philosophy as
operators/multimodal.py (uncompressed container formats parse for
real; gzip members would need no external lib either via stdlib gzip,
but per-member-gzipped WARCs are stubbed until needed).

Scale shape: binaryFile gives one row per file (a WARC segment is
~1 GB by convention — the task granularity crawls already ship);
record splitting is sequential WITHIN a file but parallel across the
thousands of segment files, which is exactly how Common-Crawl-scale
jobs are structured. Headers parse to typed columns; payloads stay
opaque binary for the downstream multimodal/text operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def parse_warc_bytes(raw: bytes, strict: bool = True) -> list[dict]:
    """Split one WARC container into records (pure stdlib).

    Tolerates arbitrary header order and unknown headers; requires the
    mandatory ``Content-Length``. ``strict=False`` stops at the first
    malformed record instead of raising (salvage mode for truncated
    segment tails — a real crawl-transfer failure case)."""
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        start = pos
        if not raw.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(f"not a WARC record at offset {pos}")
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            if strict:
                raise ValueError("unterminated WARC header block")
            break
        headers: dict[str, str] = {}
        lines = raw[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:  # line 0 is the version
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(f"record at {start} lacks Content-Length")
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            if strict:
                raise ValueError("truncated WARC payload")
            break
        out.append(
            {
                "record_offset": start,
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "record_id": headers.get("warc-record-id"),
                "content_type": headers.get("content-type"),
                "content_length": length,
                "payload": raw[body_start : body_start + length],
            }
        )
        pos = body_start + length
    return out


def read_warc(
    spark: SparkSession, path: str, strict: bool = True
) -> DataFrame:
    """WARC files -> one row per record. See module docstring."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), strict=strict):
                    rows.append({"file": fname, **rec})
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(split, WARC_SCHEMA)


def warc_record_bytes(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    content_type: str = "text/plain",
) -> bytes:
    """Serialize one WARC record (the test-fixture builder twin of the
    parser — round-tripping through both pins the byte layout)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if target_uri is not None:
        headers.insert(2, b"WARC-Target-URI: " + target_uri.encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"
