"""Round-10 bug hunt, real-codec media + grouped-training family:
pure-python CLOSED-FORM expectations (never re-running the engine's
parsers) — BMP/PPM/WAV header metadata and byte sizes from the
synthesis recipe, content sums (incl. the signed PCM-16 wraparound),
the aspect-preserving resize arithmetic over sha256-stub dimensions,
per-label Lloyd fits as the literal loop, and token-shard assignment
by exclusive prefix offsets.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

GRID = 1_000_000_000


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _media_shape(did: int):
    if did % 3 == 0:
        n = 16 + (did * 13) % 480
        return ("wav", None, None, n)
    if did % 3 == 1:
        return ("bmp", 1 + (did * 7) % 31, 1 + (did * 11) % 17, None)
    return ("ppm", 1 + (did * 5) % 29, 1 + (did * 3) % 13, None)


def test_multimodal_decode_matches_closed_form(spark, sf_dir):
    got = {r["media_id"]: r for r in QUERIES["multimodal_decode"](spark, sf_dir).collect()}
    for did in (int(i) for i in _pq(sf_dir, "documents")["doc_id"]):
        fmt, w, h, n = _media_shape(did)
        r = got[did]
        assert r["format"] == fmt
        if fmt == "wav":
            assert r["width"] is None and r["height"] is None
            assert r["duration_ms"] == 2 * n * 1000 // 16000
            assert r["n_bytes"] == 44 + 2 * n
        elif fmt == "bmp":
            stride = (3 * w + 3) // 4 * 4
            assert (r["width"], r["height"]) == (w, h)
            assert r["duration_ms"] is None
            assert r["n_bytes"] == 54 + stride * h
        else:
            hdr = len(f"P6\n{w} {h}\n255\n")
            assert (r["width"], r["height"]) == (w, h)
            assert r["n_bytes"] == hdr + 3 * w * h


def test_multimodal_features_matches_content_sums(spark, sf_dir):
    got = {r["media_id"]: r for r in QUERIES["multimodal_features"](spark, sf_dir).collect()}
    for did in (int(i) for i in _pq(sf_dir, "documents")["doc_id"]):
        fmt, w, h, n = _media_shape(did)
        fill = did % 251
        r = got[did]
        assert r["format"] == fmt
        if fmt == "wav":
            sample = fill * 257 - (65536 if fill >= 128 else 0)
            assert (r["n_units"], r["unit_sum"]) == (n, n * sample)
        else:
            assert (r["n_units"], r["unit_sum"]) == (
                3 * w * h,
                fill * 3 * w * h,
            )


def test_multimodal_resize_matches_halfup_arithmetic(spark, sf_dir):
    got = {r["media_id"]: r for r in QUERIES["multimodal_resize"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    expect = {}
    for i, t in zip(d["doc_id"], d["text"]):
        if int(i) % 3 != 1:  # stub kind: only images resize
            continue
        db = hashlib.sha256(t.encode("utf-8")).digest()
        w, h = 16 + db[0] % 240, 16 + db[1] % 240
        m = max(w, h)
        expect[int(i)] = (
            w,
            h,
            int(math.floor(w * 64 / m + 0.5)),
            int(math.floor(h * 64 / m + 0.5)),
        )
    assert set(got) == set(expect)
    for i, (w, h, ow, oh) in expect.items():
        r = got[i]
        assert (r["width"], r["height"], r["out_width"], r["out_height"]) == (
            w,
            h,
            ow,
            oh,
        )


def test_grouped_kmeans_matches_per_label_lloyd(spark, sf_dir):
    got = {
        (r["label"], r["cluster"]): r
        for r in QUERIES["grouped_kmeans"](spark, sf_dir).collect()
    }
    emb = _pq(sf_dir, "embeddings").sort_values("vec_id")
    groups: dict = defaultdict(dict)
    for i, lab, v in zip(emb["vec_id"], emb["label"], emb["embedding"]):
        groups[lab][int(i)] = [float(x) for x in v]

    def dist(e, c):
        acc = 0.0
        for x, y in zip(e, c):
            acc += (x - y) * (x - y)
        return round(acc, 9)

    agg: dict = defaultdict(lambda: [0, 0])
    for lab, vecs in groups.items():
        ids = sorted(vecs)
        cents = {c: vecs[ids[c - 1]] for c in range(1, 5)}
        # one update round, then the final assignment (iters=1 path)
        assigned = {
            i: min((dist(e, c), k) for k, c in cents.items())
            for i, e in vecs.items()
        }
        sums: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
        for i, (_, k) in assigned.items():
            for pos, x in enumerate(vecs[i]):
                s = sums[k][pos]
                s[0] += _ha(x * GRID)
                s[1] += 1
        cents = {
            k: [
                dims[pos][0] / GRID / dims[pos][1]
                for pos in sorted(dims)
            ]
            for k, dims in sums.items()
        }
        for i, e in vecs.items():
            d_, k = min((dist(e, c), kk) for kk, c in cents.items())
            a = agg[(lab, k)]
            a[0] += 1
            a[1] += _ha(d_ * 1e6)
    assert set(got) == set(agg)
    for key, (n, iq) in agg.items():
        r = got[key]
        assert r["n"] == n, key
        assert r["inertia"] == pytest.approx(iq / 1e6, abs=1e-5), key


def test_token_shards_matches_prefix_offsets(spark, sf_dir):
    got = {r["shard"]: r for r in QUERIES["token_shards"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents").sort_values("doc_id")
    agg: dict = defaultdict(lambda: [0, 0, None, None])
    cum = 0
    for i, t in zip(d["doc_id"], d["text"]):
        n = len(t.split(" "))
        shard = cum // 4096
        cum += n
        a = agg[shard]
        a[0] += 1
        a[1] += n
        a[2] = int(i) if a[2] is None else min(a[2], int(i))
        a[3] = int(i) if a[3] is None else max(a[3], int(i))
    assert set(got) == set(agg)
    for s, (nd, tt, fd, ld) in agg.items():
        r = got[s]
        assert (
            r["n_docs"],
            r["total_tokens"],
            r["first_doc"],
            r["last_doc"],
        ) == (nd, tt, fd, ld)
