"""Streaming NB-classifier inference (SURVEY.md §2.10 × §2.11).

The streaming twin of the fastText-style classifier
(``plans/classify.py``), split exactly like the LM quality scorer
(``streaming/quality.py``):

  * the model (the B×C weight grid + per-class stats) is TRAINED ONCE
    and persisted as parquet — bigint qlog2 weights round-trip
    losslessly, so a streamed prediction is bit-identical to a batch
    prediction (pinned by test);
  * per-document argmax is STATELESS (a doc's class never depends on
    other docs), so each micro-batch predicts independently through
    the shared ``nb_predict`` — no streaming state, no watermark;
  * model REFRESH (retraining on a newer slice) stays a periodic
    batch job that overwrites the artifact directory — the
    train-once / serve-many pattern of the IVF centroids and BPE
    merges.

Snapshots land under ``preds_path/batch_id=N`` (idempotent per-batch
layout): a replayed batch overwrites its own snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.classify import nb_predict, nb_train_weights

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def persist_nb_artifacts(
    spark: SparkSession, labeled: DataFrame, model_path: str
) -> None:
    """Train the NB model on ``labeled(doc_id, label, text)`` and
    persist both artifacts."""
    weights, cstat = nb_train_weights(labeled)
    weights.write.mode("overwrite").parquet(f"{model_path}/weights")
    cstat.write.mode("overwrite").parquet(f"{model_path}/cstat")


def load_nb_artifacts(
    spark: SparkSession, model_path: str
) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{model_path}/weights"),
        spark.read.parquet(f"{model_path}/cstat"),
    )


def stream_nb_predictions(
    spark: SparkSession,
    docs_dir: str,
    model_path: str,
    preds_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Start the arrival-time classifier: watch ``docs_dir`` for
    document parquet files, predict each micro-batch against the
    persisted model (label column carried through for later
    evaluation), and write ``(doc_id, label, predicted)`` snapshots
    under ``batch_id=N``."""
    weights, cstat = load_nb_artifacts(spark, model_path)

    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _predict(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        labeled = batch_df.select(
            "doc_id", F.col("lang").alias("label"), "text"
        )
        nb_predict(labeled, weights, cstat).write.mode("overwrite").parquet(
            f"{preds_path}/batch_id={batch_id}"
        )

    w = (
        stream.writeStream.foreachBatch(_predict)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
