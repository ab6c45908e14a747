"""KMeans clustering over the embeddings table (north-star ML extension).

The reference's ML surface is regression-only (MLOperations.scala:27-72);
clustering is the other half of the pyspark.ml story a corpus pipeline
needs — coarse quantization for IVF-style ANN (the `label` bucket the
similarity queries treat as given is exactly what this produces) and
topic-ish grouping for mixture control.

Scale notes: KMeans in pyspark.ml is iterative treeAggregate — each
iteration is one map-side pass + a driver-side centroid update of k×dim
doubles; no shuffle of the data itself. Cost scales linearly in rows and
centroids broadcast, so the shape survives 100 TB (init via k-means||,
itself distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def kmeans_cluster_sizes(embeddings: DataFrame, k: int = 8, seed: int = 42,
                         vec_col: str = "embedding") -> DataFrame:
    """Cluster embeddings with seeded KMeans; return per-cluster sizes and
    centroid norms (cluster ids are arbitrary → rows-only check).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    data = embeddings.select(
        "vec_id", array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=20).fit(data)
    assigned = model.transform(data)
    return (
        assigned.groupBy(F.col("prediction").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("cluster_id")
    )


def lloyd_dataframe(points: DataFrame, seed_ids: list[int], iters: int = 2,
                    id_col: str = "vec_id", vec_col: str = "v",
                    dim: int | None = None) -> DataFrame:
    """K-means Lloyd iterations as PURE DataFrame operations — no
    pyspark.ml, no RNG: centroids seed from fixed point ids, each
    round is (broadcast centroids → per-point argmin by squared L2 →
    per-dimension mean), unrolled ``iters`` times into one lazy plan.

    FIXED-DIM REQUIREMENT (r10 ADVICE): the unrolled distance reads
    exactly ``dim`` elements per vector, so every vector must have the
    table's one constant dimension — a longer vector is silently
    truncated to ``dim`` terms, a shorter one contributes NULL d2
    (non-ANSI element_at). Pass ``dim`` explicitly when you know it to
    keep the plan FULLY lazy; when omitted it is sampled from one
    arbitrary row (a limit-1 Spark job at plan-construction time).

    Determinism contract (what makes this oracle-checkable when
    `ml_kmeans_embeddings` is rows-only): seeding is by id, argmin ties
    break on centroid id, and centroids are ROUNDED to 1e-9 after every
    update — so both engines compare points against bit-identical
    centroids and partial-aggregation reorder noise (~1e-13) can never
    flip an assignment.

    Returns (id, cid, d2) after the final assignment. Scale shape: the
    per-round shuffle is the k-row centroid broadcast + one groupBy
    (cid, dim) over exploded dims — dims are (long, long, double)
    triples, never whole vectors; iterations multiply plan depth, not
    data size (chain localCheckpoint for iters ≫ 5).
    """
    assigned, _ = _lloyd_rounds(points, seed_ids, iters, id_col, vec_col, dim)
    return assigned.select("id", "cid", "d2")


def lloyd_centroids(points: DataFrame, seed_ids: list[int], iters: int = 1,
                    id_col: str = "vec_id", vec_col: str = "v",
                    dim: int | None = None) -> DataFrame:
    """(cid, c): centroids AFTER ``iters`` Lloyd updates, same
    determinism contract as :func:`lloyd_dataframe` (id seeding, cid
    tie-break, 1e-9 rounding per update) — the trained coarse quantizer
    the IVF similarity path probes against. Same fixed-dim requirement
    and optional ``dim`` (pass it to keep the plan lazy)."""
    _, cent = _lloyd_rounds(points, seed_ids, iters, id_col, vec_col, dim)
    return cent


def _lloyd_rounds(points: DataFrame, seed_ids: list[int], iters: int,
                  id_col: str, vec_col: str, dim: int | None = None):
    from ..functions.vectors import embedding_dim, squared_l2_unrolled

    cent = points.filter(F.col(id_col).isin(seed_ids)).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("c")
    )
    # Unrolled fixed-dim d2 (r10): the HOF fold is CodegenFallback —
    # interpreted per scored row; unrolling is bit-identical (same
    # left-assoc double adds — functions/vectors.py rationale), so the
    # 1e-9-rounded determinism contract is untouched.
    if dim is None:
        dim = embedding_dim(points, vec_col)
    assigned = None
    for _ in range(iters):
        joined = points.crossJoin(F.broadcast(cent)).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            "cid",
            squared_l2_unrolled(F.col(vec_col), F.col("c"), dim).alias("d2"),
        )
        w = Window.partitionBy("id").orderBy("d2", "cid")
        assigned = (
            joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        dims = assigned.select("cid", F.posexplode("v").alias("i", "x"))
        cent = (
            dims.groupBy("cid", "i")
            .agg((F.floor(F.avg("x") * 1e9 + F.lit(0.5)) / 1e9).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("s"))
            .select("cid", F.transform("s", lambda st: st.getField("m")).alias("c"))
        )
    return assigned, cent
