"""Streaming LM-quality scoring (SURVEY.md §2.10 × §2.11, r8).

The streaming twin of the CCNet-style perplexity filter
(``operators/lm.py``): a corpus lands file-by-file over hours, and the
quality score that decides a document's training fate should be
stamped at ARRIVAL, not in a nightly batch.  The split of labor is
exactly the one the batch operator documents:

  * the LM artifacts (``vocab_s``, ``sden``) are TRAINED ONCE from a
    held-out slice and persisted as parquet — bigints round-trip
    losslessly, so a streamed score is bit-identical to a batch score
    (pinned by test);
  * per-document score keys are STATELESS (a doc's perplexity never
    depends on other docs), so each micro-batch scores independently
    through the shared ``score_documents`` — no streaming state, no
    watermark, nothing to rescale;
  * only the head/middle/tail TERCILE CUT is corpus-wide — that stays
    a periodic batch job over the accumulated score snapshots (the
    same batch/stream split as index maintenance vs index rebuild).

Snapshots land under ``scores_path/batch_id=N`` (the idempotent
per-batch layout of ``streaming/sink.py``): a replayed batch
overwrites its own snapshot, never duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.lm import score_documents, train_unigram_lm

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def persist_lm_artifacts(
    spark: SparkSession,
    docs: DataFrame,
    lm_path: str,
    holdout_mod: int = 10,
) -> None:
    """Train the unigram LM and persist both artifacts (train-once /
    serve-many — the IVF-centroid and BPE-merge pattern)."""
    vocab_s, sden = train_unigram_lm(docs, holdout_mod)
    vocab_s.write.mode("overwrite").parquet(f"{lm_path}/vocab")
    sden.write.mode("overwrite").parquet(f"{lm_path}/sden")


def load_lm_artifacts(
    spark: SparkSession, lm_path: str
) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{lm_path}/vocab"),
        spark.read.parquet(f"{lm_path}/sden"),
    )


def stream_quality_scores(
    spark: SparkSession,
    docs_dir: str,
    lm_path: str,
    scores_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Start the arrival-time scorer: watch ``docs_dir`` for document
    parquet files, score each micro-batch against the persisted LM,
    and write ``(doc_id, key)`` snapshots under ``batch_id=N``."""
    vocab_s, sden = load_lm_artifacts(spark, lm_path)
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        score_documents(batch_df, vocab_s, sden).write.mode(
            "overwrite"
        ).parquet(f"{scores_path}/batch_id={batch_id}")

    w = (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
