"""Closed-form tests for round-6 wave-6 operators: RRF fusion,
item-based CF, modularity, JS divergence, and the AMS F2 sketch.

Parity covers the registered queries end-to-end; these pin the
operator semantics on hand-computable inputs.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        from defimap_data_pipelines_spark.operators.ranking import rrf_fuse

        r1 = spark.createDataFrame(
            [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
        )
        r2 = spark.createDataFrame(
            [(20, 1), (30, 2), (40, 3)], "doc_id long, rank long"
        )
        got = {
            r["doc_id"]: r
            for r in rrf_fuse([r1, r2], k=60, top=10).collect()
        }
        nano = lambda rk: round(1e9 / (60 + rk))  # noqa: E731
        assert got[20]["rrf_nano"] == nano(2) + nano(1)
        assert got[20]["in_lists"] == 2
        assert got[40]["rrf_nano"] == nano(3)
        assert got[40]["in_lists"] == 1
        # doc 20 (ranks 2+1) beats doc 30 (ranks 3+2) beats doc 10
        ranks = {d: got[d]["rank"] for d in got}
        assert ranks[20] == 1 and ranks[30] == 2 and ranks[10] == 3

    def test_tie_breaks_by_id(self, spark):
        from defimap_data_pipelines_spark.operators.ranking import rrf_fuse

        r1 = spark.createDataFrame(
            [(5, 1), (3, 2)], "doc_id long, rank long"
        )
        r2 = spark.createDataFrame(
            [(3, 1), (5, 2)], "doc_id long, rank long"
        )
        got = rrf_fuse([r1, r2], top=10).orderBy("rank").collect()
        assert [r["doc_id"] for r in got] == [3, 5]

    def test_empty_rankings_rejected(self, spark):
        from defimap_data_pipelines_spark.operators.ranking import rrf_fuse

        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])


class TestItemCf:
    def test_cosine_from_counts(self, spark):
        # Baskets: {1,2} {1,2} {1,3}. c_1=3, c_2=2, c_3=1.
        # sim(1,2)=2/sqrt(6); sim(1,3)=1/sqrt(3); sim(2,3)=0 (absent).
        from defimap_data_pipelines_spark.operators.ranking import (
            itemcf_topk,
        )

        rows = [(100, 1), (100, 2), (101, 1), (101, 2), (102, 1), (102, 3)]
        df = spark.createDataFrame(rows, "b long, i long")
        got = {
            (r["i"], r["j"]): r
            for r in itemcf_topk(df, "b", "i", k=5).collect()
        }
        assert got[(1, 2)]["cij"] == 2
        assert got[(1, 2)]["sim"] == pytest.approx(
            2 / math.sqrt(3 * 2), abs=1e-9
        )
        assert got[(1, 3)]["sim"] == pytest.approx(
            1 / math.sqrt(3 * 1), abs=1e-9
        )
        assert (2, 3) not in got

    def test_duplicate_items_in_basket_count_once(self, spark):
        from defimap_data_pipelines_spark.operators.ranking import (
            itemcf_topk,
        )

        rows = [(100, 1), (100, 1), (100, 2)]
        df = spark.createDataFrame(rows, "b long, i long")
        got = {
            (r["i"], r["j"]): r["cij"]
            for r in itemcf_topk(df, "b", "i", k=5).collect()
        }
        assert got[(1, 2)] == 1

    def test_mega_basket_dropped(self, spark):
        from defimap_data_pipelines_spark.operators.ranking import (
            itemcf_topk,
        )

        rows = [(100, 1), (100, 2)] + [(200, i) for i in range(1, 12)]
        df = spark.createDataFrame(rows, "b long, i long")
        got = {
            (r["i"], r["j"]): r["cij"]
            for r in itemcf_topk(df, "b", "i", k=5, max_basket=10).collect()
        }
        # basket 200 (11 items) is dropped; only basket 100's pair stays
        assert got == {(1, 2): 1, (2, 1): 1}

    def test_item_filter_prunes_left_side(self, spark):
        from defimap_data_pipelines_spark.operators.ranking import (
            itemcf_topk,
        )

        rows = [(100, 1), (100, 2), (100, 50)]
        df = spark.createDataFrame(rows, "b long, i long")
        got = itemcf_topk(
            df, "b", "i", k=5, item_filter=lambda c: c < 10
        ).collect()
        assert {r["i"] for r in got} == {1, 2}
        # 50 still appears as a RECOMMENDATION (right side)
        assert {r["j"] for r in got} == {1, 2, 50}


class TestAmsF2:
    def test_exact_f2_and_bounded_error(self, spark):
        from defimap_data_pipelines_spark.operators.sketches import ams_f2

        # counts: a->3, b->2, c->1 => F2 = 9 + 4 + 1 = 14
        rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)]
        df = spark.createDataFrame(rows, "k string")
        got = ams_f2(df, "k", estimators=32).collect()[0]
        assert got["f2_exact"] == 14
        assert got["estimators"] == 32
        # estimate is unbiased w/ bounded variance; on 3 keys the
        # sign-sum magnitude is at most 6 so Y_j <= 36
        assert 0 <= got["f2_est"] <= 36

    def test_single_key_exact(self, spark):
        # One distinct key: every estimator's |sign sum| == n exactly,
        # so the estimate equals F2 = n^2 with zero error.
        from defimap_data_pipelines_spark.operators.sketches import ams_f2

        df = spark.createDataFrame([("x",)] * 7, "k string")
        got = ams_f2(df, "k", estimators=8).collect()[0]
        assert got["f2_exact"] == 49
        assert got["f2_est"] == pytest.approx(49.0)
        assert got["rel_err"] == pytest.approx(0.0)

    def test_sign_is_plus_minus_one(self, spark):
        from defimap_data_pipelines_spark.operators.sketches import (
            ams_hash_bits,
            ams_sign,
        )

        df = spark.createDataFrame(
            [(str(i),) for i in range(64)], "k string"
        )
        bits = ams_hash_bits(F.col("k"))
        vals = {
            r["s"]
            for r in df.select(ams_sign(bits, 3).alias("s")).collect()
        }
        assert vals == {-1, 1}

    def test_estimator_cap(self, spark):
        from defimap_data_pipelines_spark.operators.sketches import ams_f2

        df = spark.createDataFrame([("x",)], "k string")
        with pytest.raises(ValueError, match=r"\[1, 60\]"):
            ams_f2(df, "k", estimators=61)


class TestModularityQuery:
    def test_perfect_partition_positive_q(self, spark, sf_dir):
        # Sanity on the registered query's math shape with a toy
        # graph: two triangles, partition = the triangles. Q > 0 and
        # equals the hand value 2*(3/6 - (6/12)^2) in nano units.
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
        com = {n: "A" if n <= 3 else "B" for n in range(1, 7)}
        m = len(edges)
        ec = {"A": 3, "B": 3}
        dc = {"A": 6, "B": 6}
        q = {
            c: ec[c] / m - (dc[c] / (2 * m)) ** 2
            for c in ("A", "B")
        }
        assert q["A"] == pytest.approx(0.25)
        # engine side: replicate with DataFrames through the same ops
        ed = spark.createDataFrame(edges, "u long, v long")
        lbl = spark.createDataFrame(
            [(n, c) for n, c in com.items()], "node long, com string"
        )
        mm = ed.agg(F.count(F.lit(1)).cast("long").alias("m"))
        within = (
            ed.join(
                lbl.select(F.col("node").alias("u"), F.col("com").alias("ca")),
                "u",
            )
            .join(
                lbl.select(F.col("node").alias("v"), F.col("com").alias("cb")),
                "v",
            )
            .filter(F.col("ca") == F.col("cb"))
            .groupBy(F.col("ca").alias("com"))
            .agg(F.count(F.lit(1)).cast("long").alias("ec"))
        )
        sym = ed.select(F.col("u").alias("node")).unionByName(
            ed.select(F.col("v").alias("node"))
        )
        degs = (
            sym.join(lbl, "node")
            .groupBy("com")
            .agg(F.count(F.lit(1)).cast("long").alias("dc"))
        )
        half = F.col("dc").cast("double") / (2 * F.col("m"))
        got = {
            r["com"]: r["qv"]
            for r in degs.join(within, "com", "left")
            .crossJoin(F.broadcast(mm))
            .select(
                "com",
                (
                    F.coalesce(F.col("ec"), F.lit(0)).cast("double")
                    / F.col("m")
                    - half * half
                ).alias("qv"),
            )
            .collect()
        }
        assert got["A"] == pytest.approx(0.25, abs=1e-12)
        assert got["B"] == pytest.approx(0.25, abs=1e-12)


def _jsd_reference(pa: dict, pb: dict) -> float:
    keys = set(pa) | set(pb)
    ta, tb = sum(pa.values()), sum(pb.values())
    out = 0.0
    for k in keys:
        a = pa.get(k, 0) / ta
        b = pb.get(k, 0) / tb
        mid = 0.5 * (a + b)
        if a > 0:
            out += 0.5 * a * math.log(a / mid)
        if b > 0:
            out += 0.5 * b * math.log(b / mid)
    return out


class TestJsDivergence:
    def test_disjoint_vocab_is_ln2(self, spark, sf_dir):
        # Identity check on the registered query's formula via the
        # plain-Python reference: disjoint distributions -> ln 2.
        assert _jsd_reference({"x": 3}, {"y": 5}) == pytest.approx(
            math.log(2)
        )

    def test_identical_is_zero(self):
        assert _jsd_reference({"x": 2, "y": 2}, {"x": 4, "y": 4}) == (
            pytest.approx(0.0)
        )

    def test_registered_query_bounds(self, spark, sf_dir):
        from defimap_data_pipelines_spark.plans.queries import QUERIES

        got = QUERIES["js_divergence"](spark, sf_dir).collect()
        assert len(got) > 0
        ln2_nano = math.log(2) * 1e9
        for r in got:
            assert -1000 <= r["js_nano"] <= ln2_nano + 1000
