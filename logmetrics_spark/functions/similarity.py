"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k (the baseline/oracle);
  native ``zip_with``/``aggregate`` dot products + window rank, fully
  SQL-mirrorable.
- :func:`ivf_topk` — IVF-style ANN scale path: deterministic centroid
  subset, vectors assigned to their nearest centroid (coarse
  quantizer), queries probe only ``nprobe`` nearest cells. At 100 TB
  the cell assignment is a broadcast join against the (tiny) centroid
  set and the probe join touches ~nprobe/C of the corpus — recall < 1
  by construction, verified against the exact baseline in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine6


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``emb``: (vec_id, embedding); ``queries``: (q_id, q_embedding).
    Returns (q_id, rank, vec_id, cos6); self-matches excluded; ties
    broken by vec_id (deterministic)."""
    joined = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = joined.withColumn("cos6", cosine6(F.col("embedding"), F.col("q_embedding")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos6").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos6")
    )


def make_queries(emb: DataFrame, every: int = 50) -> DataFrame:
    """Deterministic query subset: every Nth vec_id."""
    return emb.filter(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )


def make_centroids(emb: DataFrame, every: int = 25) -> DataFrame:
    """Deterministic coarse-quantizer centroids: every Nth vector
    (stand-in for k-means; the IVF mechanics are identical)."""
    return emb.filter(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_embedding")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF ANN: assign vectors to nearest centroid, probe nprobe cells.

    Returns (q_id, rank, vec_id, cos6) — approximate: only vectors in
    the probed cells are scored."""
    # cell assignment (broadcast the centroid set; one pass over emb)
    ec = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "c_cos", cosine6(F.col("embedding"), F.col("c_embedding"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("c_id").asc())
    assigned = (
        ec.withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select("vec_id", "embedding", F.col("c_id").alias("cell"))
    )
    # query -> nprobe nearest cells
    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "c_cos", cosine6(F.col("q_embedding"), F.col("c_embedding"))
    )
    w_probe = Window.partitionBy("q_id").orderBy(F.col("c_cos").desc(), F.col("c_id").asc())
    probes = (
        qc.withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= nprobe)
        .select("q_id", "q_embedding", F.col("c_id").alias("cell"))
    )
    # score only within probed cells
    scored = assigned.join(probes, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = scored.withColumn("cos6", cosine6(F.col("embedding"), F.col("q_embedding")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos6").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos6")
    )
