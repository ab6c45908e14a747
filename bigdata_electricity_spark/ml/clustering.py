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

from pyspark.sql import DataFrame, functions as F


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
