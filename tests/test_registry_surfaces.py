"""Freshness gates for the registry-derived surfaces.

The r6 verdict found two drift bugs the suite did not catch: the
committed docs/QUERY_INDEX.md said 244 queries while the registry
held 268, and 92 registered queries had no BENCH_QUERIES entry (one
of them, markov_attribution, shipped a 39.8 s plan that only the
driver's bench ever measured). These tests make both drifts a local
red: every registry change must regenerate the index
(tools/query_index.py) and land with a bench entry.
"""

from __future__ import annotations

import os
import re

from defimap_data_pipelines_spark.plans.queries import ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_query_index_total_matches_registry():
    path = os.path.join(REPO, "docs", "QUERY_INDEX.md")
    text = open(path).read()
    m = re.search(r"Total: (\d+) queries, (\d+) oracle-backed", text)
    assert m, "QUERY_INDEX.md missing its Total line"
    assert int(m.group(1)) == len(QUERIES), (
        f"QUERY_INDEX.md says {m.group(1)} queries but the registry "
        f"has {len(QUERIES)} — run tools/query_index.py"
    )
    assert int(m.group(2)) == len(ORACLE), (
        f"QUERY_INDEX.md says {m.group(2)} oracle-backed but the "
        f"registry has {len(ORACLE)} — run tools/query_index.py"
    )


def test_query_index_rows_match_registry():
    path = os.path.join(REPO, "docs", "QUERY_INDEX.md")
    rows = set()
    for line in open(path):
        m = re.match(r"\| \d+ \| `([^`]+)` \|", line)
        if m:
            rows.add(m.group(1))
    assert rows == set(QUERIES), (
        f"index/registry drift: only-in-index={sorted(rows - set(QUERIES))[:5]} "
        f"only-in-registry={sorted(set(QUERIES) - rows)[:5]}"
    )


def test_every_registered_query_is_benched():
    import bench

    benched = set(bench.BENCH_QUERIES)
    missing = sorted(set(QUERIES) - benched)
    assert not missing, (
        f"{len(missing)} registered queries have no BENCH_QUERIES "
        f"entry (first 10: {missing[:10]}) — a registration without "
        "a bench entry ships unmeasured"
    )
    stale = sorted(benched - set(QUERIES))
    assert not stale, f"bench entries for unregistered queries: {stale}"
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES)), (
        "duplicate names in BENCH_QUERIES"
    )
