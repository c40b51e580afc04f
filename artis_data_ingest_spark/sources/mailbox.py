"""Mbox / EML email-corpus ingest — stdlib ``email`` only.

Mailing-list archives (Enron, LKML, Apache lists, public-inbox
mirrors) are a staple LLM pretraining/instruction source, and they
ship as RFC 4155 mbox files or loose RFC 5322 ``.eml`` messages.  The
Python stdlib carries a complete, battle-tested parser (``email``
with ``policy.default``: header decoding per RFC 2047, multipart
walking, base64/quoted-printable transfer decoding, charset
handling) — so unlike the binary codecs in this repo there is
nothing to re-implement, only to DISTRIBUTE correctly:

  * ``read_mbox`` — ``binaryFile`` scan of ``*.mbox`` (the FILE is
    the parallelism unit: mbox is a concatenation format with no
    internal index, exactly like the zip/tar sources) → Arrow-batched
    ``mapInPandas`` splits on RFC 4155 ``From `` envelope lines,
    un-stuffs ``>From `` quoting, and parses each message.
  * ``read_eml`` — same pipeline over one-message-per-file layouts
    (Maildir-ish exports, public-inbox blobs).

Per message: envelope sequence, Message-ID, parsed Date (timezone-
normalized to UTC), From/To, decoded Subject, the PLAIN-TEXT body
(first text/plain part, transfer- and charset-decoded; falls back to
a stripped text/html part), character count, attachment count.  A
message the parser cannot handle yields a ``parse_ok=false`` row the
pipeline can count and quarantine — never a task failure (the same
PERMISSIVE contract as the JSONL/media sources).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from datetime import timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .files import transparent_decompress

MAIL_SCHEMA = T.StructType([
    T.StructField("mailbox", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("message_id", T.StringType()),
    T.StructField("date_ts", T.TimestampType()),
    T.StructField("from_addr", T.StringType()),
    T.StructField("to_addrs", T.StringType()),
    T.StructField("subject", T.StringType()),
    T.StructField("body", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("n_attachments", T.LongType()),
    T.StructField("parse_ok", T.BooleanType()),
])

_FROM_LINE = re.compile(rb"(?m)^From [^\n]*\n")
_TAG_RE = re.compile(r"<[^>]+>")


def split_mbox(blob: bytes) -> list[bytes]:
    """RFC 4155 split: messages begin at ``From `` envelope lines;
    ``>From `` body quoting is un-stuffed afterwards."""
    if not blob.lstrip(b"\r\n").startswith(b"From "):
        return []
    parts = _FROM_LINE.split(blob)
    return [
        p.replace(b"\n>From ", b"\nFrom ")
        for p in parts if p.strip()
    ]


def parse_message(raw: bytes) -> dict:
    """One RFC 5322 message → the MAIL_SCHEMA column dict."""
    import email
    import email.policy
    import email.utils

    out = {
        "message_id": None, "date_ts": None, "from_addr": None,
        "to_addrs": None, "subject": None, "body": None,
        "n_chars": None, "n_attachments": None, "parse_ok": False,
    }
    try:
        msg = email.message_from_bytes(raw, policy=email.policy.default)
        out["message_id"] = (
            str(msg["Message-ID"]).strip() if msg["Message-ID"] else None
        )
        if msg["Date"]:
            dt = email.utils.parsedate_to_datetime(str(msg["Date"]))
            if dt.tzinfo is not None:
                dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
            out["date_ts"] = dt
        if msg["From"]:
            out["from_addr"] = email.utils.parseaddr(
                str(msg["From"]))[1] or None
        if msg["To"]:
            addrs = email.utils.getaddresses([str(msg["To"])])
            out["to_addrs"] = ",".join(a for _, a in addrs if a) or None
        out["subject"] = str(msg["Subject"]) if msg["Subject"] else None
        body = msg.get_body(preferencelist=("plain",))
        text = None
        if body is not None:
            text = body.get_content()
        else:
            html = msg.get_body(preferencelist=("html",))
            if html is not None:
                text = _TAG_RE.sub("", html.get_content())
        out["body"] = text
        out["n_chars"] = len(text) if text is not None else 0
        out["n_attachments"] = sum(1 for _ in msg.iter_attachments())
        out["parse_ok"] = True
    except Exception:
        # PERMISSIVE: a torn/miscoded message becomes a countable
        # parse_ok=false row, never a task failure
        pass
    return out


def _mail_rows(path: str, messages: list[bytes]) -> list[dict]:
    import os

    name = os.path.basename(path)
    rows = []
    for i, raw in enumerate(messages):
        rec = parse_message(raw)
        rec["mailbox"] = name
        rec["seq"] = i + 1
        rows.append(rec)
    return rows


def _to_pdf(rows: list[dict]) -> pd.DataFrame:
    cols = [f.name for f in MAIL_SCHEMA.fields]
    return pd.DataFrame({c: [r.get(c) for r in rows] for c in cols})


def read_mbox(spark: SparkSession, in_dir: str) -> DataFrame:
    """One row per message across every ``*.mbox`` under ``in_dir``."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter",
                "*.{mbox,mbox.gz,mbox.bz2,mbox.xz}")
        .load(in_dir)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_mail_rows(
                    path,
                    split_mbox(transparent_decompress(bytes(blob))),
                ))
            yield _to_pdf(rows)

    return files.mapInPandas(_parse, schema=MAIL_SCHEMA)


def read_eml(spark: SparkSession, in_dir: str) -> DataFrame:
    """One row per ``*.eml`` file (message-per-file layouts)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter",
                "*.{eml,eml.gz,eml.bz2,eml.xz}")
        .load(in_dir)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_mail_rows(
                    path, [transparent_decompress(bytes(blob))]
                ))
            yield _to_pdf(rows)

    return files.mapInPandas(_parse, schema=MAIL_SCHEMA)
