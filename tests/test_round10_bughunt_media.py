"""Round-10 bug hunt, near-dup verify + media-plumbing family:
pure-python third implementations from the sf0.001 parquet —
char-5-gram Jaccard pairs via explicit set arithmetic (the bitset
kernel's answer recomputed from raw sets), edit-distance pairs via a
python DP over block candidates, the multimodal digest stub via
hashlib sha256, overlapping chunk spans with md5 checks, and the
HTML extraction regex pipeline replayed with Python re.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def _norm_toks(text: str) -> list[str]:
    t = _norm(text)
    return t.split(" ") if t else [""]


def _char5(text: str) -> frozenset:
    s = _norm(text)
    if len(s) < 5:
        return frozenset({s})
    return frozenset(s[i : i + 5] for i in range(len(s) - 4))


def test_char_jaccard_pairs_matches_set_arithmetic(spark, sf_dir):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["char_jaccard_pairs"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    sets = {int(i): _char5(t) for i, t in zip(d["doc_id"], d["text"])}
    ids = sorted(sets)
    expect = {}
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.5:
                expect[(a, b)] = j
    assert set(got) == set(expect)
    for k, j in expect.items():
        assert got[k] == pytest.approx(j, abs=1e-9), k


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_python_dp(spark, sf_dir):
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_distance"]
        for r in QUERIES["edit_distance_pairs"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    blocks: dict = defaultdict(list)
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _norm_toks(t)
        blk = hashlib.md5(" ".join(toks[:2]).encode()).hexdigest()
        blocks[blk].append((int(i), _norm(t)))
    expect = {}
    for rows in blocks.values():
        rows.sort()
        for ai, (a, na) in enumerate(rows):
            for b, nb in rows[ai + 1 :]:
                if abs(len(na) - len(nb)) > 150:
                    continue
                dist = _lev(na, nb)
                if dist <= 150:
                    expect[(a, b)] = dist
    assert got == expect


def test_multimodal_digest_matches_sha256_stub(spark, sf_dir):
    rows = QUERIES["multimodal_digest_features"](spark, sf_dir).collect()
    got = {r["media_id"]: r for r in rows}
    d = _pq(sf_dir, "documents")
    for i, t in zip(d["doc_id"], d["text"]):
        raw = t.encode("utf-8")
        dg = hashlib.sha256(raw)
        db = dg.digest()
        kind = ("video", "image", "audio")[
            0 if i % 3 == 0 else 1 if i % 3 == 1 else 2
        ]
        r = got[int(i)]
        assert r["kind"] == kind
        assert r["n_bytes"] == len(raw)
        assert r["sha256"] == dg.hexdigest()
        assert r["width"] == 16 + db[0] % 240
        assert r["height"] == 16 + db[1] % 240
        # non-video kinds force n_frames = 1 (engine contract)
        assert r["n_frames"] == (
            1 + db[2] % 32 if kind == "video" else 1
        )


def test_doc_chunking_matches_overlapping_spans(spark, sf_dir):
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in QUERIES["doc_chunking"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    size, stride = 64, 48
    expect = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _norm_toks(t)
        n = len(toks)
        k = 1 + (max(n - size, 0) + stride - 1) // stride
        for c in range(k):
            piece = toks[c * stride : c * stride + size]
            expect[(int(i), c)] = (
                n,
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
    assert set(got) == set(expect)
    for key, (n, npc, md5_) in expect.items():
        r = got[key]
        assert (r["n_doc_tokens"], r["n_chunk_tokens"], r["chunk_md5"]) == (
            n,
            npc,
            md5_,
        )


def test_html_text_extract_matches_python_re(spark, sf_dir):
    got = {r["doc_id"]: r for r in QUERIES["html_text_extract"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    drop = re.compile(
        r"(?is)<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>"
    )
    tag = re.compile(r"(?s)<[^>]*>")
    for i, t in zip(d["doc_id"], d["text"]):
        html = (
            "<html><head><title>doc</title>"
            f'<script type="text/javascript">var id={i};</script>'
            f"<style>p{{color:red}}</style></head><body><h1>Doc {i}"
            f"</h1><p>{t}</p>"
            '<div class="footer">&amp;copy; 2024 '
            "&lt;crawler&gt;</div></body></html>"
        )
        out = drop.sub(" ", html)
        out = tag.sub(" ", out)
        for ent, rep in [
            ("&nbsp;", " "),
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&#39;", "'"),
            ("&amp;", "&"),
        ]:
            out = out.replace(ent, rep)
        out = re.sub(r"\s+", " ", out).strip()
        r = got[int(i)]
        assert r["n_chars"] == len(out)
        assert r["head"] == out[:40]
        assert r["text_md5"] == hashlib.md5(out.encode()).hexdigest()
