"""Round-9 bug hunt, eval-metric + survival family: pure-python
references from the sf0.001 parquet. roc_auc is re-derived through
the MIDRANK definition (average rank of ties, the scipy convention)
instead of the doubled block rank-sums both engines use; pr_auc via
the step-integral AP definition; lift_gains via an explicit sorted
ranking; kaplan_meier via the classic product-limit formula."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events_scored(sf_dir):
    e = _pq(sf_dir, "events")[["event_id", "event_type", "value"]].copy()
    e["vq"] = [_half_away(v * 100) for v in e["value"]]
    e["y"] = (e["event_type"] == "purchase").astype(int)
    return e


def test_roc_auc_matches_midrank_definition(spark, sf_dir):
    row = QUERIES["roc_auc"](spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]
    e = _events_scored(sf_dir)
    # midranks: ranks 1..n ascending by vq, ties get the block mean
    blocks = sorted(Counter(e["vq"]).items())
    midrank, off = {}, 0
    for vq, cnt in blocks:
        midrank[vq] = off + (cnt + 1) / 2
        off += cnt
    n1 = int(e["y"].sum())
    n0 = len(e) - n1
    r1 = sum(midrank[vq] for vq, y in zip(e["vq"], e["y"]) if y)
    auc = (r1 - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert row["n_pos"] == n1 and row["n_neg"] == n0
    assert row["auc"] == pytest.approx(auc, abs=1e-9)
    assert row["gini"] == pytest.approx(2 * auc - 1, abs=1e-9)


def test_pr_auc_matches_step_integral_definition(spark, sf_dir):
    row = QUERIES["pr_auc"](spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]
    e = _events_scored(sf_dir)
    blocks = sorted(
        e.groupby("vq").agg(cnt=("y", "size"), pos=("y", "sum")).itertuples(),
        key=lambda b: -b.Index,
    )
    n1 = int(e["y"].sum())
    ccnt = cpos = 0
    ap = 0.0
    for b in blocks:
        ccnt += b.cnt
        cpos += int(b.pos)
        ap += int(b.pos) * (cpos / ccnt)
    ap /= n1
    assert row["n_pos"] == n1 and row["n_neg"] == len(e) - n1
    assert row["baseline"] == pytest.approx(n1 / len(e), abs=1e-9)
    # engines nano-quantize each precision term; error <= 5e-10
    assert row["avg_precision"] == pytest.approx(ap, abs=1e-8)


def test_lift_gains_matches_explicit_ranking(spark, sf_dir):
    got = {
        r["bin"]: r for r in QUERIES["lift_gains"](spark, sf_dir).collect()
    }
    e = _events_scored(sf_dir)
    ranked = e.sort_values(
        ["vq", "event_id"], ascending=[False, True], kind="stable"
    )
    nn = len(ranked)
    bins = defaultdict(lambda: [0, 0])
    for i, y in enumerate(ranked["y"]):
        b = (i * 10) // nn
        bins[b][0] += 1
        bins[b][1] += int(y)
    tp = int(e["y"].sum())
    cum = 0
    assert set(got) == set(bins)
    for b in sorted(bins):
        n, pos = bins[b]
        cum += pos
        assert got[b]["n"] == n
        assert got[b]["pos"] == pos
        assert got[b]["rate"] == pytest.approx(pos / n, abs=1e-9)
        assert got[b]["lift"] == pytest.approx(
            (pos * nn) / (n * tp), abs=1e-9
        )
        assert got[b]["cum_gain"] == pytest.approx(cum / tp, abs=1e-9)


def test_kaplan_meier_matches_product_limit(spark, sf_dir):
    got = QUERIES["kaplan_meier"](spark, sf_dir).collect()
    e = (
        _pq(sf_dir, "events")[["user_id", "ts", "event_id", "event_type"]]
        .sort_values(["user_id", "ts", "event_id"], kind="stable")
        .copy()
    )
    e["us"] = e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    horizon = int(e["us"].max())
    subjects = defaultdict(lambda: [0, 0])  # (cohort, dur) -> [tot, dth]
    for _, grp in e.groupby("user_id"):
        uss = grp["us"].tolist()
        types = grp["event_type"].tolist()
        for i, (us, t) in enumerate(zip(uss, types)):
            nxt = uss[i + 1] if i + 1 < len(uss) else None
            dur = ((nxt if nxt is not None else horizon) - us) // 3600000000
            cell = subjects[(t, dur)]
            cell[0] += 1
            cell[1] += 1 if nxt is not None else 0
    expect = {}
    cohorts = {c for c, _ in subjects}
    for c in cohorts:
        durs = sorted(d for cc, d in subjects if cc == c)
        total = sum(subjects[(c, d)][0] for d in durs)
        at_risk = total
        surv = 1.0
        for d in durs:
            tot, dth = subjects[(c, d)]
            if dth > 0 and at_risk > dth:
                surv *= (at_risk - dth) / at_risk
                expect[(c, d)] = (at_risk, dth, surv)
            at_risk -= tot
    assert {(r["cohort"], r["dur"]) for r in got} == set(expect)
    for r in got:
        at_risk, dth, surv = expect[(r["cohort"], r["dur"])]
        assert r["at_risk"] == at_risk
        assert r["dth"] == dth
        # engines nano-quantize per-step logs; drift << 1e-6
        assert r["survival"] == pytest.approx(surv, abs=1e-6)
    assert len(got) > 5, "fixture must produce a real survival curve"
