"""Round-10 bug hunt, WARC wire-format round trip: the engine
serializes every document into gzip'd WARC response records and
parses them back; the pure-python expectation is computed straight
from the source table (utf-8 byte length + md5) — if the record
serializer, gzip member framing, or the multi-member walker slips a
single byte anywhere, the parsed-back payload digests diverge.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from defimap_data_pipelines_spark.plans.queries import QUERIES


def test_warc_gz_round_trip_matches_source_digests(spark, sf_dir):
    got = {
        r["doc_id"]: (r["content_length"], r["payload_md5"])
        for r in QUERIES["warc_gz_extract"](spark, sf_dir).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    expect = {
        int(i): (
            len(t.encode("utf-8")),
            hashlib.md5(t.encode("utf-8")).hexdigest(),
        )
        for i, t in zip(d["doc_id"], d["text"])
    }
    assert got == expect
