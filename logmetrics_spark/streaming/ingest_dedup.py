"""Streaming corpus ingest with incremental near-dup dedup.

The recurring-crawl shape the incremental LSH index exists for, wired
as a Structured Streaming job: each micro-batch of new documents is

1. deduplicated WITHIN the batch (MinHash LSH pairs -> keep the min-id
   doc of every near-dup component),
2. deduplicated AGAINST the kept corpus through the persistent LSH
   index (:func:`~logmetrics_spark.functions.dedup.minhash_index`
   tables probed by
   :func:`~logmetrics_spark.functions.dedup.dedup_incremental_keep` —
   O(batch) work, the corpus is never re-paired), and
3. appended to the kept-docs table, WITH its band-entry and
   hashed-shingle index rows appended alongside — so the NEXT batch
   deduplicates against everything kept so far, including this batch.

Every write lands under an ``ingest_batch=<epoch>`` partition
directory with per-batch overwrite, so a replayed micro-batch (the
foreachBatch at-least-once contract after a failure) rewrites its own
partition instead of duplicating rows — idempotent, exactly-once
OUTPUT per batch. At fleet scale the three tables are one
transactional-catalog commit (e.g. Iceberg multi-table transaction via
sources.tableio); the directory layout here is the same idea with
filesystem atomicity per partition.

Graft op — the reference pipeline (log_pipeline) has no corpus-dedup
counterpart; this composes the engine's own dedup primitives into the
ingestion topology a 100 TB training-data pipeline runs.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dedup as D

DOCS_SCHEMA_DDL = "doc_id long, text string"


def _is_path_missing(e: AnalysisException) -> bool:
    """True iff the AnalysisException is the read-side path-not-found
    — the ONLY failure that legitimately means 'no corpus yet'. Any
    other read error (transient FS fault, torn footer) must propagate:
    swallowing it would silently skip corpus dedup for the batch and
    permanently admit duplicates."""
    cond = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
    name = cond() if cond is not None else ""
    return name == "PATH_NOT_FOUND" or "PATH_NOT_FOUND" in str(e)


class IngestDedupSink:
    """foreachBatch handler holding the output layout; separable from
    the stream wiring so batch jobs (backfills) reuse it verbatim."""

    def __init__(
        self,
        root: str,
        threshold: float = 0.4,
        bucket_cap: int | None = 64,
    ) -> None:
        self.kept_dir = os.path.join(root, "kept")
        self.entries_dir = os.path.join(root, "index_entries")
        self.shingles_dir = os.path.join(root, "index_shingles")
        self.threshold = threshold
        self.bucket_cap = bucket_cap

    def _read_index(
        self, spark: SparkSession, batch_id: int
    ) -> tuple[DataFrame, DataFrame] | None:
        """The corpus index EXCLUDING this batch's own partition.

        foreachBatch is at-least-once: a batch replayed after a crash
        that happened between the partition writes and the checkpoint
        commit would otherwise read its OWN previous output, match
        every doc against its identical self (jaccard=1.0), and
        overwrite its partitions empty — permanently dropping the
        batch. Filtering ingest_batch != batch_id makes the replay
        see exactly the pre-batch corpus, so the rewrite is
        bit-identical to the first attempt."""
        try:
            entries = spark.read.parquet(self.entries_dir)
            shh = spark.read.parquet(self.shingles_dir)
        except AnalysisException as e:
            if _is_path_missing(e):
                return None  # genuine first batch: no corpus yet
            raise
        entries = entries.filter(F.col("ingest_batch") != batch_id)
        shh = shh.filter(F.col("ingest_batch") != batch_id)
        return entries.drop("ingest_batch"), shh.drop("ingest_batch")

    def __call__(self, batch_docs: DataFrame, batch_id: int) -> None:
        spark = batch_docs.sparkSession
        batch_docs = batch_docs.select("doc_id", "text")
        caches: list[DataFrame] = []
        # (1) within-batch near-dup components -> min-id survivor;
        # same bucket_cap as the corpus probe, so a viral drop file
        # (one huge near-dup family in a single batch) degrades to
        # the chain-capped pair shape instead of quadratic pairs
        within = D.dedup_near_keep(
            batch_docs,
            D.minhash_lsh_pairs(
                batch_docs,
                self.threshold,
                bucket_cap=self.bucket_cap,
                cache_registry=caches,
            ),
        )
        # (2) against the kept corpus via the persistent index
        idx = self._read_index(spark, batch_id)
        if idx is not None:
            kept = D.dedup_incremental_keep(
                within,
                idx,
                self.threshold,
                bucket_cap=self.bucket_cap,
                cache_registry=caches,
            )
        else:
            kept = within
        kept = kept.persist()  # feeds the doc write AND both index builds
        caches.append(kept)
        try:
            # an all-duplicates batch keeps nothing: writing its three
            # EMPTY partition dirs would poison every later read — an
            # empty parquet dir has no footer to infer a schema from,
            # so the next batch's index read raises
            # UNABLE_TO_INFER_SCHEMA (NOT the path-missing condition
            # _read_index maps to 'no corpus yet') and the stream
            # wedges permanently, since the empty dirs persist across
            # restarts. kept is already persisted, so the isEmpty
            # probe is one cached-partition peek; skipping the writes
            # is also replay-safe (the same batch recomputes empty).
            if kept.isEmpty():
                return
            # (3) append docs + index rows, idempotently per batch
            part = f"ingest_batch={batch_id}"
            kept.write.mode("overwrite").parquet(
                os.path.join(self.kept_dir, part)
            )
            entries_new, shh_new = D.minhash_index(kept, cache_registry=caches)
            entries_new.write.mode("overwrite").parquet(
                os.path.join(self.entries_dir, part)
            )
            shh_new.write.mode("overwrite").parquet(
                os.path.join(self.shingles_dir, part)
            )
        finally:
            # unpersist everything this batch pinned (the kept docs
            # plus the pair build's shingle/candidate caches) — a
            # continuous run over thousands of micro-batches must not
            # grow executor storage without bound
            for df in caches:
                df.unpersist()

    def kept_docs(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.kept_dir).drop("ingest_batch")


def read_docs_stream(
    spark: SparkSession, path: str, max_files: int = 4
) -> DataFrame:
    """File-source stream of documents (new parquet files discovered
    per trigger — same poller shape as read_pages_stream)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def run_streaming_ingest_dedup(
    spark: SparkSession,
    docs_path: str,
    out_root: str,
    checkpoint: str,
    threshold: float = 0.4,
    bucket_cap: int | None = 64,
    available_now: bool = True,
    max_files: int = 4,
):
    """Start the streaming ingest-dedup job; returns (query, sink).

    ``available_now`` drains the current file set then stops (the
    batch-backfill trigger); pass False for a continuous tailer. The
    checkpoint dir makes restarts resume from the last committed
    micro-batch, pairing with the sink's per-batch idempotent writes."""
    sink = IngestDedupSink(out_root, threshold, bucket_cap)
    w = (
        read_docs_stream(spark, docs_path, max_files)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start(), sink
