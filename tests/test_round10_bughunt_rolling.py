"""Round-10 bug hunt, rolling-series + sketch-overlap family:
pure-python third implementations — full drawdown series (exact
doubles, running peak), 30-day rolling annualized volatility from
quantized moments, the pairwise return-correlation matrix via
date-aligned dict joins, and the KMV k-min-wise union Jaccard
replayed end-to-end through hashlib.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

KMV_K = 256


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


@pytest.fixture(scope="module")
def gotk(spark, sf_dir):
    from defimap_data_pipelines_spark.operators.growth import (
        growth_of_10k,
    )
    from defimap_data_pipelines_spark.plans.queries import (
        orders_raw_series,
    )

    rows = growth_of_10k(orders_raw_series(spark, sf_dir)).select(
        "date", "name", "percent_change", "end_day_investment"
    ).collect()
    per: dict = defaultdict(list)
    for r in rows:
        per[r["name"]].append(
            (r["date"], r["percent_change"], r["end_day_investment"])
        )
    for v in per.values():
        v.sort(key=lambda t: t[0])
    return per


def test_drawdown_series_matches_running_peak(spark, sf_dir, gotk):
    got = {
        (r["name"], str(r["date"])): r
        for r in QUERIES["drawdown_series"](spark, sf_dir).collect()
    }
    for name, rows in gotk.items():
        peak = -math.inf
        for d, _, edi in rows:
            peak = max(peak, edi)
            r = got[(name, str(d))]
            assert r["running_peak"] == peak
            assert r["drawdown"] == edi - peak
            assert r["drawdown_pct"] == pytest.approx(
                edi / peak - 1, abs=1e-12
            )


def test_rolling_volatility_matches_quantized_moments(spark, sf_dir, gotk):
    got = {
        (r["name"], str(r["date"])): r["vol_30d_annualized"]
        for r in QUERIES["rolling_volatility"](spark, sf_dir).collect()
    }
    expect = {}
    for name, rows in gotk.items():
        pq = [_ha(pc * 1e9) for _, pc, _ in rows]
        for i, (d, _, _) in enumerate(rows):
            lo = max(0, i - 29)
            w = pq[lo : i + 1]
            n = len(w)
            if n < 10:
                continue
            s, ss = sum(w), sum(x * x for x in w)
            vol = (
                math.sqrt((ss - s * s / n) / (n - 1))
                / 1e9
                * math.sqrt(365.0)
            )
            expect[(name, str(d))] = vol
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-8), k


def test_return_correlation_matrix_matches_aligned_pearson(
    spark, sf_dir, gotk
):
    got = {
        (r["name_a"], r["name_b"]): r
        for r in QUERIES["return_correlation_matrix"](spark, sf_dir).collect()
    }
    series = {
        name: {d: _ha(pc * 1e9) for d, pc, _ in rows}
        for name, rows in gotk.items()
    }
    names = sorted(series)
    for ai, a in enumerate(names):
        for b in names[ai + 1 :]:
            days = sorted(set(series[a]) & set(series[b]))
            xs = [series[a][d] for d in days]
            ys = [series[b][d] for d in days]
            n = len(days)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            cov = n * float(sxy) - float(sx) * sy
            vx = n * float(sxx) - float(sx) * sx
            vy = n * float(syy) - float(sy) * sy
            r = got[(a, b)]
            assert r["n_days"] == n
            if vx > 0 and vy > 0:
                assert r["corr"] == pytest.approx(
                    cov / math.sqrt(vx * vy), abs=1e-8
                )
            else:
                assert r["corr"] is None


def _shingles3(text: str) -> set[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    toks = t.split(" ") if t else [""]
    if len(toks) < 3:
        return {" ".join(toks)}
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    }


def test_kmv_source_overlap_matches_hashlib_union(spark, sf_dir):
    got = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["kmv_source_overlap"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    per_src: dict = defaultdict(set)
    for s, t in zip(d["source"], d["text"]):
        for sh in _shingles3(t):
            per_src[s].add(
                int(hashlib.md5(sh.encode()).hexdigest()[:15], 16)
            )
    sketch = {
        s: sorted(hs)[:KMV_K] for s, hs in per_src.items()
    }
    names = sorted(sketch)
    for ai, a in enumerate(names):
        for b in names[ai + 1 :]:
            sa, sb = set(sketch[a]), set(sketch[b])
            merged = sorted(sa | sb)[:KMV_K]
            k_common = sum(1 for h in merged if h in sa and h in sb)
            r = got[(a, b)]
            assert (r["k_merged"], r["k_common"]) == (
                len(merged),
                k_common,
            )
            assert r["jaccard_est"] == pytest.approx(
                k_common / len(merged), abs=1e-6
            )
