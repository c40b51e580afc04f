"""Streaming Merkle-manifest maintenance (SURVEY.md §2.10 × the
content-addressed snapshot family in plans/sharding.py).

Arrival-time twin of ``q_manifest_incremental``: documents land
batch-by-batch and the corpus manifest must stay current without ever
re-reading earlier text.  Cross-batch state is leaf-hash-sized (one
md5 per doc, the same footprint as the dedup fingerprints):

  * batch N writes its docs' LEAF hashes under ``leaves/batch_id=N``
    (idempotent overwrite on replay — the streaming/index.py guard);
  * the shards TOUCHED by batch N re-fold from the union of all
    committed leaves (prior snapshots have the hashes — no text
    re-read), untouched shard rows carry over from the previous
    manifest snapshot;
  * the merged shard manifest lands under ``manifest/batch_id=N``.

When every doc has arrived, the latest manifest snapshot equals the
batch ``merkle_manifest`` of the full corpus exactly (pinned by test)
— the integrity root is maintained in O(batch + touched shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sharding import _MERKLE_SHARD
from .dedup_corpus import _list_batch_ids

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _leaves(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.expr(f"doc_id div {_MERKLE_SHARD}").alias("shard"),
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.md5("text"))
        ).alias("h"),
    )


def _fold_shards(leaves: DataFrame) -> DataFrame:
    return leaves.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("doc_id").alias("doc_id"),
                                F.col("h").alias("p"),
                            )
                        )
                    ),
                    lambda x: x["p"],
                ),
                "",
            )
        ).alias("hash"),
    )


def _committed(
    spark: SparkSession, path: str, before: int
) -> DataFrame | None:
    batches = [b for b in _list_batch_ids(spark, path) if b < before]
    if not batches:
        return None
    return spark.read.parquet(
        *[f"{path}/batch_id={b}" for b in batches]
    )


def stream_manifest_maintenance(
    spark: SparkSession,
    docs_dir: str,
    leaves_path: str,
    manifest_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Start the arrival-time Merkle-manifest maintainer."""
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        new_leaves = _leaves(batch_df).localCheckpoint()
        new_leaves.write.mode("overwrite").parquet(
            f"{leaves_path}/batch_id={batch_id}"
        )
        touched = new_leaves.select("shard").distinct()
        prior_leaves = _committed(spark, leaves_path, batch_id)
        all_leaves = (
            new_leaves
            if prior_leaves is None
            else prior_leaves.unionByName(new_leaves)
        )
        refolded = _fold_shards(
            all_leaves.join(F.broadcast(touched), "shard")
        )
        prev_manifest = _committed(spark, manifest_path, batch_id)
        if prev_manifest is None:
            manifest = refolded
        else:
            # latest snapshot is the newest batch dir; carry untouched
            latest = max(
                b for b in _list_batch_ids(spark, manifest_path)
                if b < batch_id
            )
            prev = spark.read.parquet(
                f"{manifest_path}/batch_id={latest}"
            )
            manifest = prev.join(
                touched, "shard", "left_anti"
            ).unionByName(refolded)
        manifest.write.mode("overwrite").parquet(
            f"{manifest_path}/batch_id={batch_id}"
        )

    w = (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
