"""Streaming Bloom-filter membership triage (SURVEY.md §2.10 × §2.11).

The arrival-time twin of ``q_bloom_membership`` and the *fixed-state*
counterpart of ``streaming/dedup_corpus.py``: where the exact
deduplicator's cross-batch state grows with the corpus (one
fingerprint per kept doc), the Bloom triage keeps at most m bit
positions TOTAL no matter how much text has arrived — the state the
exact path must persist anyway shrinks to a membership pre-filter that
fits in a broadcast.

Per micro-batch:
  * probe every arriving doc's k=3 md5-sliced bit positions against
    the union of committed bit snapshots (batch_id < N — the same
    replay guard as streaming/index.py);
  * verdict 'maybe' (all k bits set → route to the exact anti-join)
    or 'new' (provably unseen → skip the expensive path entirely);
  * append the batch's own distinct NEW bit positions as an
    idempotent ``batch_id=N`` snapshot.

No false negatives ever (a set bit is never cleared), so 'new' is a
safe fast-path at any scale; the 'maybe' share that is actually new is
the false-positive cost, bounded by the filter geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sharding import _BLOOM_K, _bit_positions
from .dedup_corpus import _list_batch_ids

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def seen_bits(
    spark: SparkSession, bits_path: str, before: int | None = None
) -> DataFrame | None:
    """Union of committed bit snapshots (batch_id < before)."""
    batches = [
        b
        for b in _list_batch_ids(spark, bits_path)
        if before is None or b < before
    ]
    if not batches:
        return None
    paths = [f"{bits_path}/batch_id={b}" for b in batches]
    return spark.read.parquet(*paths).select("pos").distinct()


def stream_bloom_triage(
    spark: SparkSession,
    docs_dir: str,
    bits_path: str,
    verdicts_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Start the arrival-time Bloom triage over ``docs_dir``."""
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _triage(batch_df: DataFrame, batch_id: int) -> None:
        probe = batch_df.select(
            "doc_id", _bit_positions(F.col("text")).alias("bits")
        )
        probe_bits = probe.select(
            "doc_id", F.explode("bits").alias("pos")
        )
        seen = seen_bits(spark, bits_path, before=batch_id)
        if seen is not None:
            hits = probe_bits.join(
                F.broadcast(seen.withColumn("hit", F.lit(1))), "pos", "left"
            )
        else:
            hits = probe_bits.withColumn("hit", F.lit(None).cast("int"))
        verdicts = (
            hits.groupBy("doc_id")
            .agg((F.count("hit") == _BLOOM_K).alias("bloom_maybe"))
            .select(
                "doc_id",
                F.when(F.col("bloom_maybe"), "maybe")
                .otherwise("new")
                .alias("verdict"),
            )
        )
        verdicts.write.mode("overwrite").parquet(
            f"{verdicts_path}/batch_id={batch_id}"
        )
        probe_bits.select("pos").distinct().write.mode("overwrite").parquet(
            f"{bits_path}/batch_id={batch_id}"
        )

    w = (
        stream.writeStream.foreachBatch(_triage)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
