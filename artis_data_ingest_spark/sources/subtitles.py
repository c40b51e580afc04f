"""SRT / WebVTT subtitle ingest — the text half of scraped A/V.

Caption tracks are a first-class LLM-pretraining source (video-
platform transcripts, film subtitle corpora like OpenSubtitles) and a
supervision signal for speech models (text aligned to time spans).
Both formats are line-oriented and need no library:

  * SRT: blank-line-separated cues — numeric index line,
    ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing line (comma decimal),
    then 1..n text lines.
  * WebVTT (RFC 8216's companion): ``WEBVTT`` header, optional cue
    identifiers, ``HH:MM:SS.mmm --> HH:MM:SS.mmm`` (dot decimal,
    hours optional), cue settings after the timing ignored, NOTE /
    STYLE blocks skipped, inline markup (``<i>``, ``<c.cls>``,
    voice spans) stripped.

Spark mapping: ``binaryFile`` scan (one task per file) →
Arrow-batched ``mapInPandas`` → one row per cue with millisecond
start/end/duration and the flattened text.  Cues whose timing line
does not parse yield a ``_corrupt`` row for that cue (PERMISSIVE,
same contract as the JSONL/XML/mbox sources) — the rest of the file
still lands.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .files import transparent_decompress

SUBTITLE_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("start_ms", T.LongType()),
    T.StructField("end_ms", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("_corrupt", T.BooleanType()),
])

_SRT_TIME = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)
_VTT_TIME = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)
_MARKUP = re.compile(r"<[^>]*>")


def _ms(h, m, s, ms) -> int:
    return (
        int(h or 0) * 3600_000 + int(m) * 60_000 + int(s) * 1000
        + int(ms)
    )


def parse_subtitles(text: str) -> list[dict]:
    """SRT or WebVTT (auto-detected) → cue dicts."""
    text = text.lstrip("﻿")
    is_vtt = text.lstrip().startswith("WEBVTT")
    time_re = _VTT_TIME if is_vtt else _SRT_TIME
    blocks = re.split(r"\r?\n\s*\r?\n", text)
    cues: list[dict] = []
    seq = 0
    for block in blocks:
        lines = [ln.strip("\r") for ln in block.split("\n")
                 if ln.strip()]
        if not lines:
            continue
        head = lines[0].strip()
        if is_vtt and (
            head.startswith(("WEBVTT", "NOTE", "STYLE", "REGION"))
        ):
            continue
        timing_idx = next(
            (i for i, ln in enumerate(lines[:2])
             if time_re.search(ln)),
            None,
        )
        if timing_idx is None:
            if not is_vtt and head.isdigit() and len(lines) == 1:
                continue  # stray index with no cue body
            seq += 1
            cues.append({
                "seq": seq, "start_ms": None, "end_ms": None,
                "duration_ms": None, "text": None, "_corrupt": True,
            })
            continue
        m = time_re.search(lines[timing_idx])
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        body = "\n".join(lines[timing_idx + 1:])
        body = _MARKUP.sub("", body).strip()
        seq += 1
        cues.append({
            "seq": seq, "start_ms": start, "end_ms": end,
            "duration_ms": end - start, "text": body,
            "_corrupt": False,
        })
    return cues


def read_subtitles(
    spark: SparkSession, in_dir: str, glob: str = "*.{srt,vtt,srt.gz,vtt.gz,srt.bz2,vtt.bz2}"
) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(in_dir)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            out: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                try:
                    txt = transparent_decompress(
                        bytes(blob)
                    ).decode("utf-8", errors="replace")
                    for cue in parse_subtitles(txt):
                        cue["file"] = name
                        out.append(cue)
                except Exception:
                    out.append({
                        "file": name, "seq": 0, "start_ms": None,
                        "end_ms": None, "duration_ms": None,
                        "text": None, "_corrupt": True,
                    })
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in out]
                 for f in SUBTITLE_SCHEMA.fields}
            )

    return files.mapInPandas(_parse, schema=SUBTITLE_SCHEMA)
