"""Physical-layout guarantees the 100 TB posture depends on:
bucketed co-located joins (no exchange), partition pruning, filter
pushdown and column pruning in the scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.sources.bucketing import write_bucketed
from defimap_data_pipelines_spark.sources.parquet import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # (spark.sql.warehouse.dir is static; bucketed tables land in the
    # default ./spark-warehouse, dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    write_bucketed(l, "l_bucketed", ["l_orderkey"], 8)
    write_bucketed(o, "o_bucketed", ["o_orderkey"], 8)
    try:
        joined = spark.table("l_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == l.count()
        # contrast: the unbucketed join must shuffle both sides
        plain = l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS l_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_partition_pruning(spark, sf_dir, tmp_path):
    from defimap_data_pipelines_spark.plans.domain import orders_raw_series

    path = str(tmp_path / "by_name")
    raw = orders_raw_series(spark, sf_dir)
    raw.write.mode("overwrite").partitionBy("name").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("name") == "1-URGENT")
    plan = _plan(pruned)
    # partition filter reached the scan, and only one partition is read
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    assert pruned.select("name").distinct().count() == 1


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem")
    q = l.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_merge_upsert_semantics(spark, tmp_path):
    from defimap_data_pipelines_spark.sources.writers import merge_upsert

    path = str(tmp_path / "merge_tbl")
    base = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 20.0),
            ("b", 1, 30.0),
            ("c", 1, 40.0),
        ],
        ["name", "k", "v"],
    )
    merge_upsert(base, path, keys=["name", "k"], partition_cols=["name"])

    # update (a,1), insert (a,3) and (d,1); b and c untouched
    upd = spark.createDataFrame(
        [("a", 1, 11.0), ("a", 3, 33.0), ("d", 1, 44.0)],
        ["name", "k", "v"],
    )
    merge_upsert(upd, path, keys=["name", "k"], partition_cols=["name"])

    got = sorted(map(tuple, spark.read.parquet(path).select("name", "k", "v").collect()))
    assert got == [
        ("a", 1, 11.0),
        ("a", 2, 20.0),
        ("a", 3, 33.0),
        ("b", 1, 30.0),
        ("c", 1, 40.0),
        ("d", 1, 44.0),
    ]

    # idempotent: re-running the same merge is a no-op
    merge_upsert(upd, path, keys=["name", "k"], partition_cols=["name"])
    again = sorted(map(tuple, spark.read.parquet(path).select("name", "k", "v").collect()))
    assert again == got


def test_format_round_trips(spark, tmp_path):
    from defimap_data_pipelines_spark.operators.cleaning import (  # noqa: F401
        interpolate_linear,
    )
    from defimap_data_pipelines_spark.sources.formats import (
        read_format,
        write_format,
    )

    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, -2.0), (3, "c", 0.0)],
        ["id", "s", "v"],
    )
    schema = "id long, s string, v double"
    for fmt in ("parquet", "orc", "csv", "json"):
        p = str(tmp_path / fmt)
        write_format(df, p, fmt=fmt)
        back = read_format(spark, p, fmt=fmt, schema=schema)
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, back.collect()))
        if fmt == "csv":
            # CSV cannot distinguish NULL from empty; normalize
            a = [(i, s or None, v) for i, s, v in a]
            b = [(i, s or None, v) for i, s, v in b]
        assert a == b, fmt


def test_csv_requires_explicit_schema(spark, tmp_path):
    import pytest as _pytest

    from defimap_data_pipelines_spark.sources.formats import (
        read_format,
        write_format,
    )

    df = spark.range(3).select(F.col("id"))
    p = str(tmp_path / "c")
    write_format(df, p, fmt="csv")
    with _pytest.raises(ValueError, match="explicit schema"):
        read_format(spark, p, fmt="csv")


def test_text_corpus_modes(spark, tmp_path):
    from defimap_data_pipelines_spark.sources.formats import (
        read_text_corpus,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("doc one body")
    (d / "b.txt").write_text("line x\nline y")
    whole = read_text_corpus(spark, str(d), whole_files=True).collect()
    assert len(whole) == 2
    texts = {r.doc_id.split("/")[-1]: r.text for r in whole}
    assert texts["a.txt"] == "doc one body"
    assert texts["b.txt"] == "line x\nline y"
    lines = read_text_corpus(spark, str(d), whole_files=False).collect()
    assert sorted(r.text for r in lines) == [
        "doc one body", "line x", "line y"
    ]
    # content-keyed ids: stable under re-read and repartitioning
    again = read_text_corpus(spark, str(d), whole_files=False).collect()
    assert sorted(r.doc_id for r in lines) == sorted(
        r.doc_id for r in again
    )


def test_clustered_write_produces_prunable_footers(spark, tmp_path):
    """The clustered layout's promise, checked at the parquet footer
    level: per-file [min, max] ranges of the cluster key are narrow
    and (near-)disjoint, so min/max pruning can skip files; an
    unsorted write of the same data has every file spanning ~the full
    key range (no file can ever be skipped)."""
    import glob

    import pyarrow.parquet as pq

    from defimap_data_pipelines_spark.sources.writers import (
        write_clustered,
    )

    df = (
        spark.range(40_000)
        .select(
            (F.xxhash64("id") % 10_000).alias("key"), F.col("id").alias("v")
        )
    )
    clustered = str(tmp_path / "clustered")
    write_clustered(df, clustered, ["key"], max_records_per_file=5_000)
    plain = str(tmp_path / "plain")
    df.write.mode("overwrite").parquet(plain)

    def ranges(path):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                assert col.path_in_schema == "key"
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    cr = ranges(clustered)
    assert len(cr) > 4
    # clustered: total footer coverage ~= key span (near-disjoint)
    span = max(b for _, b in cr) - min(a for a, _ in cr)
    covered = sum(b - a for a, b in cr)
    assert covered <= span * 1.2, (covered, span)
    # a point predicate prunes to at most 2 candidate files
    probe = cr[len(cr) // 2][0]
    candidates = [r for r in cr if r[0] <= probe <= r[1]]
    assert len(candidates) <= 2, candidates
    # unsorted: every file spans (almost) everything — nothing prunes
    pr = ranges(plain)
    wide = [r for r in pr if (r[1] - r[0]) > span * 0.9]
    assert len(wide) == len(pr)


def test_compact_small_files(spark, tmp_path):
    """Compaction: 40 tiny appended files -> ~target-sized files,
    identical data, partition layout preserved, pruning-friendly
    clustering restored when sort_cols given."""
    from defimap_data_pipelines_spark.sources.writers import (
        compact_small_files,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    # simulate 40 incremental appends of 50 rows each
    for batch in range(40):
        (
            spark.range(batch * 50, batch * 50 + 50)
            .select(
                F.col("id"),
                (F.col("id") % 4).cast("string").alias("name"),
                (F.col("id") * 2).alias("v"),
            )
            .write.mode("append")
            .partitionBy("name")
            .parquet(path)
        )
    before = spark.read.parquet(path)
    rows_before = sorted((r.id, r.v) for r in before.collect())

    stats = compact_small_files(
        spark, path, target_bytes=1 << 20,
        partition_cols=["name"], sort_cols=["id"],
    )
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"] / 4

    after = spark.read.parquet(path)
    rows_after = sorted((r.id, r.v) for r in after.collect())
    assert rows_after == rows_before
    # partition layout preserved (directory-level name=... pruning)
    import os

    assert any(d.startswith("name=") for d in os.listdir(path))


def test_compact_small_files_rejects_uri_schemes(spark, tmp_path):
    """os.walk/os.rename can't reach scheme-qualified URIs — the old
    behavior was a silent zero-file listing then a rename failure
    (round-4 advice item)."""
    from defimap_data_pipelines_spark.sources.writers import (
        compact_small_files,
    )

    for uri in ("s3://bucket/tbl", "hdfs://nn/tbl", f"file://{tmp_path}"):
        with pytest.raises(ValueError, match="local filesystem"):
            compact_small_files(spark, uri)
