"""Streaming corpus-level exact dedup (SURVEY.md §2.10 × §2.11).

The arrival-time twin of ``q_dedup_incremental``: a corpus lands
file-by-file, and each arriving batch must be deduplicated against
EVERYTHING that has already arrived — without rescanning the earlier
text.  The state that crosses batches is the normalized-fingerprint
set alone (16 bytes/doc), persisted as per-batch parquet snapshots:

  * batch N computes its fingerprints, LEFT-ANTI joins them against
    the union of snapshots with batch_id < N (the replay guard of
    ``streaming/index.py``: a crashed batch N re-run must not see its
    own half-written snapshot), and within the batch keeps the
    min-doc_id copy per fingerprint;
  * decisions (doc_id, fp, decision) and the batch's NEW fingerprints
    land under ``.../batch_id=N`` — idempotent overwrite on replay;
  * when files arrive in doc_id order, the streamed keep-set equals
    batch ``exact_dedup``'s min-doc_id canonicals exactly (pinned by
    test); under arbitrary arrival order the canonical is the
    first-arrived copy — stated, not accidental (arrival-time dedup
    IS first-wins).

At 100 TB the fingerprint corpus is ~0.5% of the text volume and the
per-batch cost is one fingerprint shuffle + one anti-join against the
snapshot relation — O(batch), never O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _list_batch_ids(spark: SparkSession, path: str) -> list[int]:
    # Hadoop-FS discovery (streaming/index.py:_list_batch_ids): honors
    # file://, hdfs://, s3a:// wherever the job runs
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    ids = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def seen_fingerprints(
    spark: SparkSession, fps_path: str, before: int | None = None
) -> DataFrame | None:
    """Union of committed fingerprint snapshots (batch_id < before)."""
    batches = [
        b
        for b in _list_batch_ids(spark, fps_path)
        if before is None or b < before
    ]
    if not batches:
        return None
    paths = [f"{fps_path}/batch_id={b}" for b in batches]
    return spark.read.parquet(*paths).select("fp").distinct()


def stream_corpus_dedup(
    spark: SparkSession,
    docs_dir: str,
    fps_path: str,
    decisions_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Start the arrival-time deduplicator: watch ``docs_dir`` for
    document parquet files; each micro-batch writes per-doc decisions
    ('kept' | 'dup_in_batch' | 'dup_of_corpus') and appends its new
    fingerprints, both under idempotent ``batch_id=N`` snapshots."""
    from ..operators.dedup import fingerprint

    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _dedup(batch_df: DataFrame, batch_id: int) -> None:
        fp = batch_df.select(
            "doc_id", fingerprint("text").alias("fp")
        )
        w_min = F.min("doc_id").over(Window.partitionBy("fp"))
        fp = fp.withColumn("batch_keep", F.col("doc_id") == w_min)
        seen = seen_fingerprints(spark, fps_path, before=batch_id)
        if seen is not None:
            hit = fp.join(
                seen.withColumn("in_corpus", F.lit(True)), "fp", "left"
            )
        else:
            hit = fp.withColumn("in_corpus", F.lit(None).cast("boolean"))
        decisions = hit.select(
            "doc_id",
            "fp",
            F.when(F.col("in_corpus").isNotNull(), "dup_of_corpus")
            .when(~F.col("batch_keep"), "dup_in_batch")
            .otherwise("kept")
            .alias("decision"),
        )
        decisions.write.mode("overwrite").parquet(
            f"{decisions_path}/batch_id={batch_id}"
        )
        decisions.filter(F.col("decision") == "kept").select(
            "fp"
        ).distinct().write.mode("overwrite").parquet(
            f"{fps_path}/batch_id={batch_id}"
        )

    w = (
        stream.writeStream.foreachBatch(_dedup)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
