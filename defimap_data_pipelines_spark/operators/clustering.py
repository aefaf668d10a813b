"""Deterministic mini-batchless KMeans over embedding columns.

Lloyd's algorithm as pure DataFrame ops — the iterative-algorithm
pattern (like the connected-components pass in operators/corpus.py)
applied to vector data: assign = broadcast the K centroids and take the
argmin distance per row; update = explode dimensions and average per
(cluster, dim) with exact integer-quantized sums.

Determinism contract (so a DuckDB oracle can replay it exactly):
- init centroids = the embeddings of the K smallest vec_ids (no RNG);
- distances are rounded to 1e-9 before the argmin, with the cluster id
  as tiebreak — cross-engine fp drift in a 64-term dot product sits at
  ~1e-15, far under the grid;
- centroid updates quantize each summand to 1e-9 (exact bigint sums,
  order-independent) before dividing by the member count.

Scale: assignment is a broadcast nested-loop over K centroids — a
projection, no shuffle; the update shuffles K*dim grouped sums (tiny).
Iterations materialize via localCheckpoint to cut lineage growth, the
same trap corpus.py documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Quantization grid for distance comparison and centroid sums.
GRID = 1_000_000_000  # 1e-9


def _sq_dist(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """(id, cluster, dist) — nearest centroid per row.

    ``centroids`` is (cluster, c) with c a double array; it is collected
    into an array literal and evaluated as a projection (K is small), so
    the assignment needs no join or shuffle at all.
    """
    cents = sorted(
        (r["cluster"], list(r["c"])) for r in centroids.collect()
    )

    from defimap_data_pipelines_spark.functions.vector import (
        sql_double_literal as _dlit,
    )

    # struct array literal: [(cluster, dist), ...] -> array_min picks the
    # (rounded) nearest with the cluster id as tiebreak. Built as ONE
    # parsed SQL string: the Column-API form (K centroids x dims lit()
    # calls plus 2K lambda conversions) costs ~1 s of py4j round trips
    # per call site (same measurement as operators/similarity.py
    # _list_entries); the parsed tree is identical, folds and all.
    parts = []
    for k, c in cents:
        arr = "array(" + ",".join(_dlit(x) for x in c) + ")"
        d = (
            f"aggregate(zip_with(`{vec_col}`, {arr},"
            " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, w) -> acc + w)"
        )
        parts.append(f"struct(round({d}, 9) AS dist, {k} AS cluster)")
    pairs = F.expr("array(" + ",".join(parts) + ")")
    best = F.array_min(pairs)
    return emb.select(
        F.col(id_col),
        F.col(vec_col),
        best["cluster"].alias("cluster"),
        best["dist"].alias("dist"),
    )


def update_centroids(assigned: DataFrame, vec_col: str = "e") -> DataFrame:
    """(cluster, c): per-cluster mean vector with exact quantized sums.

    Formulation note: posexplode + two-level aggregation beats the
    "one groupBy with dims per-dimension sum aggregates" form by ~4x
    measured at sf0.1 — 65 aggregate buffers push HashAggregate out of
    whole-stage codegen, while the exploded form stays fully
    codegen'd and map-side combines to K*dims rows before the
    shuffle either way.
    """
    dims = assigned.select(
        "cluster", F.posexplode(vec_col).alias("pos", "val")
    )
    per_dim = dims.groupBy("cluster", "pos").agg(
        (
            F.sum(F.round(F.col("val") * GRID).cast("long"))
            / float(GRID)
            / F.count(F.lit(1))
        ).alias("m")
    )
    return per_dim.groupBy("cluster").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "m"))
        ).getField("m").alias("c")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds; returns the final assignment
    (id, cluster, dist), plus the (double-cast) vector column ``e``
    when ``keep_vec`` — consumers like semdedup_prune need the vectors
    WITH their cluster and a re-join on id would re-shuffle the
    corpus."""
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    centroids = (
        v.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster"),
            F.col("e").alias("c"),
        )
    )
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(v, centroids).localCheckpoint()
        centroids = update_centroids(assigned)
    if keep_vec:
        return assigned.select("vec_id", "e", "cluster", "dist")
    return assigned.select("vec_id", "cluster", "dist")


def kmeans_fit_grouped(
    emb: DataFrame,
    group_col: str,
    k: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One k-means model PER GROUP (per language, per source, per
    label), every group fit in the SAME corpus passes — the grouped-
    model-training pattern: G sequential fits would scan the corpus G
    times; keeping ``group_col`` in every key makes the whole model
    family one job.

    Differences from the single-model path are forced by G being
    data-dependent: centroids live as a (group, cluster, c) FRAME and
    assignment is a fan-out-k equi-join on the group key + min-struct
    argmin (map-side combinable aggregation — NOT a row_number
    window, which would shuffle the k-fanned frame a second time),
    instead of assign_clusters' inlined literal array (G*k arrays
    can't be plan literals when G is unbounded). Same determinism
    contract: seeds = k smallest ids per group, distances grid-
    rounded to 1e-9 with cluster-id tiebreak, quantized centroid
    means. Returns the final per-(group, cluster) assignment frame
    (group, vec_id, cluster, dist).
    """
    v = emb.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    wg = Window.partitionBy("g").orderBy("vec_id")
    cents = (
        v.withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") <= k)
        .select("g", F.col("_rn").alias("cluster"), F.col("e").alias("c"))
    )

    def assign(cents_df: DataFrame) -> DataFrame:
        fanned = v.join(cents_df, "g").select(
            "g",
            "vec_id",
            "e",
            "cluster",
            F.round(_sq_dist(F.col("e"), F.col("c")), 9).alias("dist"),
        )
        best = fanned.groupBy("g", "vec_id").agg(
            F.min(F.struct("dist", "cluster", "e")).alias("_b")
        )
        return best.select(
            "g",
            "vec_id",
            F.col("_b.e").alias("e"),
            F.col("_b.cluster").alias("cluster"),
            F.col("_b.dist").alias("dist"),
        )

    for _ in range(iters):
        assigned = assign(cents).localCheckpoint()
        dims = assigned.select(
            "g", "cluster", F.posexplode("e").alias("pos", "val")
        )
        per_dim = dims.groupBy("g", "cluster", "pos").agg(
            (
                F.sum(F.round(F.col("val") * GRID).cast("long"))
                / float(GRID)
                / F.count(F.lit(1))
            ).alias("m")
        )
        cents = per_dim.groupBy("g", "cluster").agg(
            F.array_sort(F.collect_list(F.struct("pos", "m")))
            .getField("m")
            .alias("c")
        )
    final = assign(cents)
    return final.select(
        F.col("g").alias(group_col), "vec_id", "cluster", "dist"
    )
