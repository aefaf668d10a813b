"""Round-12 third implementations, sketch family (r11 verdict item
5): CMS point-frequency estimates and the AMS F2 moment re-derived in
pure python from the published constructions (Cormode & Muthukrishnan
2005; Alon, Matias & Szegedy 1996) with the repo's md5 hash
derivations recomputed from hashlib — independent of BOTH engines'
md5/conv/substring stacks. The CMS replay rebuilds the whole
depth x width counter grid (collisions and all), so the comparison
pins the OVERestimates bit-for-bit, not just the lower bound.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

DEPTH, WIDTH = 4, 64  # operators/sketches.py constants, re-stated


def _norm_tokens(text: str) -> list[str]:
    """normalize_text + whitespace split (functions/text.py): lower,
    trim, collapse internal whitespace runs."""
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _cms_bucket(token: str, row: int) -> int:
    h = hashlib.md5(f"{row}|{token}".encode()).hexdigest()[:8]
    return int(h, 16) % WIDTH


def test_cms_heavy_hitters_full_grid_replay(spark, sf_dir):
    got = {
        r["token"]: (r["exact_n"], r["cms_estimate"])
        for r in QUERIES["cms_heavy_hitters"](spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts: Counter = Counter()
    for text in docs["text"]:
        counts.update(_norm_tokens(text))
    # the whole counter grid, one cell add per (distinct token, row)
    grid: dict = defaultdict(int)
    for tok, c in counts.items():
        for r in range(DEPTH):
            grid[(r, _cms_bucket(tok, r))] += c
    probes = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = {
        tok: (c, min(grid[(r, _cms_bucket(tok, r))] for r in range(DEPTH)))
        for tok, c in probes
    }
    assert got == expect
    # the one-sided error contract: estimate >= exact, always
    for tok, (c, est) in expect.items():
        assert est >= c, tok


def test_ams_f2_moment_sign_sum_replay(spark, sf_dir):
    row = QUERIES["ams_f2_moment"](spark, sf_dir).collect()
    assert len(row) == 1
    got = row[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    keys = [int(k) for k in li["l_partkey"]]
    estimators = 16
    sums = [0] * estimators
    for k in keys:
        bits = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        for j in range(estimators):
            sums[j] += 2 * ((bits >> j) & 1) - 1
    f2_est = sum(float(s) * s for s in sums) / estimators
    f2_exact = float(sum(c * c for c in Counter(keys).values()))
    assert got["estimators"] == estimators
    assert got["f2_est"] == pytest.approx(round(f2_est, 6), abs=1e-6)
    assert got["f2_exact"] == pytest.approx(f2_exact, abs=1e-6)
    assert got["rel_err"] == pytest.approx(
        round(abs(f2_est - f2_exact) / f2_exact, 9), abs=1e-9
    )
    # AMS accuracy contract at k=16: rel error ~ sqrt(2/16) — assert
    # the loose 3-sigma envelope so the test pins sanity, not luck
    assert got["rel_err"] < 3 * (2.0 / estimators) ** 0.5
