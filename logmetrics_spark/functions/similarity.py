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


# Candidate-selection margin for cosine_topk (see below): must exceed
# 2x the 6dp rounding bucket (2e-6 — a raw-score gap > 2e-6 guarantees
# strictly distinct values after round(.,6)) plus the worst-case
# divergence between the numpy matmul and the JVM sequential fold
# (<= ~1.5e-13 absolute for unit-cosines of <= 4096-dim vectors).
_TOPK_MARGIN = 5e-6


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5, max_rows: int | None = 10_000
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``emb``: (vec_id, embedding); ``queries``: (q_id, q_embedding).
    Returns (q_id, rank, vec_id, cos6); self-matches excluded; ties
    broken by vec_id (deterministic). Exact |emb| x |queries| scoring
    BY DESIGN — the recall oracle for :func:`ivf_topk`; guarded to
    validation scale on the query side (the corpus side is linear).

    Execution (guide §8: decide with small rows, score the heavy pairs
    once): the |emb| x |queries| score matrix is computed as a numpy
    matmul inside one ``mapInArrow`` pass over the corpus against the
    broadcast query matrix, which emits only CANDIDATE pairs — per
    query, every batch row within ``_TOPK_MARGIN`` of the batch-local
    k-th best raw cosine. The final cos6 values and the (cos6 desc,
    vec_id) ranking are then computed by the SAME JVM `cosine6`
    expression as the v1 crossJoin plan, restricted to candidates, so
    the output is bit-identical: any non-candidate pair's raw score
    sits > margin below its query's k-th best, hence (margin > 2x the
    1e-6 rounding bucket + float divergence) its rounded cos6 is
    STRICTLY below the k-th candidate's — it can neither enter the
    top-k nor tie with a member. Zero-norm vectors (cos6 NULL, ranked
    last) are force-emitted as candidates so degenerate inputs with
    < k finite pairs per query still reproduce the full ranking."""
    import numpy as np
    import pyarrow as pa

    from .dedup import guard_validation_scale

    guard_validation_scale(queries, max_rows, "cosine_topk(queries)", "ivf_topk")
    qrows = queries.select("q_id", "q_embedding").collect()
    q_ids = np.array([r["q_id"] for r in qrows], dtype=np.int64)
    qm = np.array([list(r["q_embedding"]) for r in qrows], dtype=np.float64)
    nq = np.linalg.norm(qm, axis=1)
    qz = nq == 0.0
    nq_safe = np.where(qz, 1.0, nq)
    n_q = len(q_ids)

    def gen(batches):
        if n_q == 0:
            return
        out_schema = pa.schema([("q_id", pa.int64()), ("vec_id", pa.int64())])
        for batch in batches:
            if batch.num_rows == 0:
                continue
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            col = batch.column("embedding")
            flat = np.asarray(col.flatten(), dtype=np.float64)
            e = flat.reshape(len(vec_ids), -1)
            ne = np.linalg.norm(e, axis=1)
            ez = ne == 0.0
            ne_safe = np.where(ez, 1.0, ne)
            scores = (e @ qm.T) / (ne_safe[:, None] * nq_safe[None, :])
            # self-pairs are excluded from the final ranking: they must
            # not consume a candidate slot (a true k-th neighbor would
            # then fall below the batch threshold)
            scores[np.equal.outer(vec_ids, q_ids)] = -np.inf
            scores[ez, :] = -np.inf  # NULL cos6: handled below
            scores[:, qz] = -np.inf
            kk = min(k, scores.shape[0])
            thr = np.partition(scores, scores.shape[0] - kk, axis=0)[
                scores.shape[0] - kk, :
            ]
            # isfinite guard: a column with < k finite scores has
            # thr = -inf, and -inf >= -inf - margin would admit every
            # masked (-inf) cell of the column
            rows, cols = np.nonzero(
                (scores >= (thr - _TOPK_MARGIN)[None, :]) & np.isfinite(scores)
            )
            out_q, out_v = q_ids[cols], vec_ids[rows]
            # zero-norm corpus vectors rank by vec_id among the NULLs;
            # emit them all (they only matter when finite pairs < k)
            if ez.any():
                zv = vec_ids[ez]
                out_q = np.concatenate([out_q, np.repeat(q_ids, len(zv))])
                out_v = np.concatenate([out_v, np.tile(zv, n_q)])
            # zero-norm queries: every pair is NULL; top-k = k smallest
            # vec_ids, so the k smallest of each batch suffice
            if qz.any():
                order = np.sort(vec_ids)[:kk]
                for q in q_ids[qz]:
                    out_q = np.concatenate([out_q, np.full(len(order), q)])
                    out_v = np.concatenate([out_v, order])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q, pa.int64()), pa.array(out_v, pa.int64())],
                schema=out_schema,
            )

    spread = emb.sparkSession.sparkContext.defaultParallelism
    cand = (
        emb.select("vec_id", "embedding")
        .repartition(spread)
        .mapInArrow(gen, "q_id long, vec_id long")
        # a pair emitted twice (score mask + a zero-norm leg, or the
        # same pair from overlapping safety legs) would occupy two
        # ranks in the row_number below — dedup before the rescore
        .distinct()
    )
    scored = (
        emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(queries), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos6", cosine6(F.col("embedding"), F.col("q_embedding")))
    )
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
            # np.stack over the object column + object-array .repeat
            # (pointer copies) replace the tolist()/per-row list
            # rebuild of v1 — same values, no per-row Python
            e = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(e, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cos = np.round((e / norms) @ cn.T, 6)
            # top-p by (cos desc, c_id asc): c_ids are sorted asc, and
            # stable argsort on -cos keeps the lower c_id first on ties
            order = np.argsort(-cos, axis=1, kind="stable")[:, :p]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), p),
                    vec_col: pdf[vec_col].to_numpy().repeat(p),
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
    # spread the corpus-side assignment matmul: the parquet scan is
    # one input split at bench scale, so without this the whole
    # |emb| x |centroids| product runs in a single task (r06; the
    # repartition lives HERE, not in assign_cells, whose plan is
    # pinned Exchange-free for composability)
    spread = emb.sparkSession.sparkContext.defaultParallelism
    assigned = assign_cells(emb.repartition(spread), centroids, 1, "vec_id", "embedding")
    probes = assign_cells(queries, centroids, nprobe, "q_id", "q_embedding")
    scored = assigned.join(probes, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = scored.withColumn("cos6", cosine6(F.col("embedding"), F.col("q_embedding")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos6").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos6")
    )
