"""Round-9 bug hunt, sketch family: hashlib replays of the md5-derived
sketches (KMV, AMS F2, CMS, windowed KMV) straight from the sf0.001
parquet. The sketches were DESIGNED to be value-hash replayable
(md5-derived hash state), so a pure-python rebuild of the sketch —
hash, retention rule, estimator — is a full third implementation, not
just a bound check."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

KMV_SPACE = float(1 << 60)


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _kmv_hash(key) -> float:
    return int(_md5(str(key))[:15], 16) / KMV_SPACE


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip(" ").lower()).split(" ")


def test_kmv_distinct_matches_hashlib_replay(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["kmv_distinct"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[["event_type", "user_id"]]
    per_type = defaultdict(set)
    for et, uid in zip(e["event_type"], e["user_id"]):
        per_type[et].add(_kmv_hash(uid))
    assert set(got) == set(per_type)
    k = 256
    for et, hashes in per_type.items():
        kept = sorted(hashes)[:k]
        est = float(len(kept)) if len(kept) < k else (k - 1) / kept[-1]
        assert got[et]["n_kept"] == len(kept)
        assert got[et]["kmv_estimate"] == pytest.approx(est, abs=1e-6)


def test_ams_f2_matches_hashlib_replay(spark, sf_dir):
    row = QUERIES["ams_f2_moment"](spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]
    li = _pq(sf_dir, "lineitem")["l_partkey"]
    sums = [0] * 16
    for pk in li:
        bits = int(_md5(str(pk))[:15], 16)
        for j in range(16):
            sums[j] += 1 if (bits >> j) & 1 else -1
    est = sum(y * y for y in sums) / 16
    exact = sum(c * c for c in Counter(li).values())
    assert row["estimators"] == 16
    assert row["f2_est"] == pytest.approx(round(est, 6), abs=1e-6)
    assert row["f2_exact"] == exact
    assert row["rel_err"] == pytest.approx(
        abs(est - exact) / exact, abs=1e-9
    )


def test_cms_heavy_hitters_matches_hashlib_replay(spark, sf_dir):
    got = {
        r["token"]: r
        for r in QUERIES["cms_heavy_hitters"](spark, sf_dir).collect()
    }
    docs = _pq(sf_dir, "documents")["text"]
    exact = Counter()
    for t in docs:
        exact.update(_tokens(t))
    depth, width = 4, 64

    def bucket(token, r):
        return int(_md5(f"{r}|{token}")[:8], 16) % width

    counters = Counter()
    for tok, n in exact.items():
        for r in range(depth):
            counters[(r, bucket(tok, r))] += n
    probes = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert set(got) == {t for t, _ in probes}
    for tok, n in probes:
        est = min(counters[(r, bucket(tok, r))] for r in range(depth))
        assert got[tok]["exact_n"] == n
        assert got[tok]["cms_estimate"] == est
        assert est >= n, "CMS error must be one-sided"


def test_trailing_distinct_kmv_matches_hashlib_replay(spark, sf_dir):
    got = {
        str(r["day"]): r
        for r in QUERIES["trailing_distinct_kmv"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[["ts", "user_id"]].copy()
    e["day"] = e["ts"].astype("datetime64[ns]").dt.normalize()
    day_users = defaultdict(set)
    for d, uid in zip(e["day"], e["user_id"]):
        day_users[d].add(uid)
    k, win = 256, 7
    epoch = pd.Timestamp("1970-01-01")
    dnums = {d: (d - epoch).days for d in day_users}
    per_day_kmin = {
        d: sorted(_kmv_hash(u) for u in us)[:k]
        for d, us in day_users.items()
    }
    expect = {}
    for d in day_users:
        in_win = [
            d2 for d2 in day_users if dnums[d] - (win - 1) <= dnums[d2] <= dnums[d]
        ]
        merged = sorted({h for d2 in in_win for h in per_day_kmin[d2]})[:k]
        est = float(len(merged)) if len(merged) < k else (k - 1) / merged[-1]
        ex = len({u for d2 in in_win for u in day_users[d2]})
        expect[str(d.date())] = (ex, est, abs(est - ex) / ex)
    assert set(got) == set(expect)
    for day, (ex, est, rel) in expect.items():
        assert got[day]["exact_distinct"] == ex
        assert got[day]["kmv_estimate"] == pytest.approx(est, abs=1e-9)
        assert got[day]["rel_err"] == pytest.approx(rel, abs=1e-9)
