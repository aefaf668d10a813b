"""WARC crawl-archive ingestion (stdlib-only parser).

Web-crawl corpora (the 100 TB training-data source) ship as WARC
containers: concatenated records, each a ``WARC/1.x`` version line,
CRLF header block, CRLF CRLF, ``Content-Length`` bytes of payload,
CRLF CRLF. This module reads WARC files through Spark's ``binaryFile``
source and splits records with a pure-Python byte walker inside
Arrow-batched ``mapInPandas`` — the same tiered-codec philosophy as
operators/multimodal.py. Both container forms parse for real with the
stdlib: plain concatenated records AND the actual Common Crawl wire
format, ``.warc.gz`` with ONE GZIP MEMBER PER RECORD (the member
boundaries are what make a 1 GB segment random-accessible from a
byte-range index — so the walker preserves each member's compressed
offset in ``record_offset``, exactly the value a CC index entry
carries).

Scale shape: binaryFile gives one row per file (a WARC segment is
~1 GB by convention — the task granularity crawls already ship);
record splitting is sequential WITHIN a file but parallel across the
thousands of segment files, which is exactly how Common-Crawl-scale
jobs are structured. Headers parse to typed columns; payloads stay
opaque binary for the downstream multimodal/text operators.
"""

from __future__ import annotations

import zlib
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


_GZ_CHUNK = 1 << 20  # feed the inflater 1 MB at a time


def _gz_members(raw: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield ``(compressed_offset, decompressed_bytes)`` for every
    gzip member in a multi-member stream.

    Feeds the stdlib inflater in 1 MB slices of a zero-copy
    memoryview — never ``decompress(raw[pos:])``, which would copy
    the remaining tail once per member (quadratic on a 1 GB segment
    with ~50k members). After a member's EOF, ``unused_data`` is at
    most one chunk long, so the next member's offset is exact
    arithmetic, not a search. Raises ``zlib.error`` on corrupt bytes
    and ``ValueError`` on a truncated final member; salvage policy
    lives in the caller."""
    view = memoryview(raw)
    n = len(raw)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = bytearray()
        fed = pos
        while not d.eof and fed < n:
            chunk = view[fed : fed + _GZ_CHUNK]
            out += d.decompress(chunk)
            fed += len(chunk)
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield pos, bytes(out)
        pos = fed - len(d.unused_data)


def parse_warc_gz_bytes(raw: bytes, strict: bool = True) -> list[dict]:
    """Split a per-record-gzipped ``.warc.gz`` container into records.

    Each gzip member decompresses to one (or, tolerated, several)
    WARC records; ``record_offset`` is rebased to the member's
    COMPRESSED offset — the number a Common Crawl index row points
    at, so a downstream fetch can range-request exactly one record.
    ``strict=False`` salvages the parsed prefix on a truncated or
    corrupt member (segment-transfer failure), mirroring
    :func:`parse_warc_bytes`."""
    out: list[dict] = []
    gen = _gz_members(raw)
    while True:
        try:
            offset, member = next(gen)
        except StopIteration:
            break
        except (zlib.error, ValueError):
            if strict:
                raise
            break
        recs = parse_warc_bytes(member, strict=strict)
        if not recs and strict:
            raise ValueError(f"gzip member at {offset} holds no record")
        for rec in recs:
            rec["record_offset"] = offset
            out.append(rec)
    return out


def parse_warc_auto(raw: bytes, strict: bool = True) -> list[dict]:
    """Magic-sniffed dispatch: gzip members vs plain concatenation."""
    if raw[:2] == b"\x1f\x8b":
        return parse_warc_gz_bytes(raw, strict=strict)
    return parse_warc_bytes(raw, strict=strict)


def read_warc(
    spark: SparkSession, path: str, strict: bool = True
) -> DataFrame:
    """WARC files -> one row per record. The container form is
    sniffed per file, so a directory mixing ``.warc`` and
    ``.warc.gz`` segments reads uniformly. See module docstring."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_auto(bytes(content), strict=strict):
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


def gzip_member_bytes(record: bytes) -> bytes:
    """One record -> one deterministic gzip member (mtime=0, no
    filename — byte-stable so oracle value hashes can replay it).
    Concatenating these is the ``.warc.gz`` builder twin of
    :func:`parse_warc_gz_bytes`."""
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(record) + co.flush()
