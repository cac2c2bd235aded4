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
    emb: DataFrame, queries: DataFrame, k: int = 5, max_rows: int | None = 10_000
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``emb``: (vec_id, embedding); ``queries``: (q_id, q_embedding).
    Returns (q_id, rank, vec_id, cos6); self-matches excluded; ties
    broken by vec_id (deterministic). Brute-force |emb| x |queries|
    BY DESIGN — the recall oracle for :func:`ivf_topk`; guarded to
    validation scale on the query side (the corpus side is linear)."""
    from .dedup import guard_validation_scale

    guard_validation_scale(queries, max_rows, "cosine_topk(queries)", "ivf_topk")
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


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-``nprobe`` centroid cells per vector in ONE narrow
    ``mapInPandas`` pass against the broadcast centroid matrix — no
    |emb| x |centroids| intermediate, no window sort-shuffle (the
    v1 crossJoin+row_number shape materialized and shuffled the full
    product). Ties broken by ascending c_id; cosine rounded to 6dp to
    match :func:`logmetrics_spark.functions.dedup.cosine6` (np.round
    is half-even vs Spark/DuckDB HALF_UP — they diverge only when a
    cosine lands within ~1 ulp of a 6dp midpoint, ~1e-16 per value;
    accepted and pinned by the IVF recall test, same status as the
    EWMA bulk-path ulp note in operators/aggregate.py).

    Centroids are tiny by contract (a coarse quantizer); collecting
    them to the driver IS the broadcast. Output: (id, vec, cell) —
    one row per (vector, probed cell)."""
    import numpy as np
    import pandas as pd

    rows = centroids.orderBy("c_id").collect()
    c_ids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cmat = np.array([list(r["c_embedding"]) for r in rows], dtype=np.float64)
    cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    p = min(nprobe, len(c_ids))

    def mapper(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            e = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(e, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cos = np.round((e / norms) @ cn.T, 6)
            # top-p by (cos desc, c_id asc): c_ids are sorted asc, and
            # stable argsort on -cos keeps the lower c_id first on ties
            order = np.argsort(-cos, axis=1, kind="stable")[:, :p]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), p),
                    vec_col: [v for v in pdf[vec_col] for _ in range(p)],
                    "cell": c_ids[order].reshape(-1),
                }
            )

    return emb.mapInPandas(
        mapper, schema=f"{id_col} long, {vec_col} array<float>, cell long"
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF ANN: assign vectors to their nearest centroid cell, probe
    the ``nprobe`` nearest cells per query, score only within probed
    cells. Both assignments are single narrow passes over a broadcast
    centroid matrix (:func:`assign_cells`); the only shuffles are the
    cell equi-join and the final per-query top-k.

    Returns (q_id, rank, vec_id, cos6) — approximate: recall vs the
    exact baseline is pinned by tests/test_functions.py."""
    assigned = assign_cells(emb, centroids, 1, "vec_id", "embedding")
    probes = assign_cells(queries, centroids, nprobe, "q_id", "q_embedding")
    scored = assigned.join(probes, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = scored.withColumn("cos6", cosine6(F.col("embedding"), F.col("q_embedding")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos6").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos6")
    )
