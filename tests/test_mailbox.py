"""Mbox/EML ingest tests (sources/mailbox.py)."""

from __future__ import annotations

import os

from artis_data_ingest_spark.sources.mailbox import (
    parse_message,
    read_eml,
    read_mbox,
    split_mbox,
)


def test_split_unstuffs_from_quoting():
    blob = (
        b"From a@x Thu Feb  1 10:00:00 2024\n"
        b"Subject: one\n\n"
        b"body line\n"
        b">From the start of a quoted line\n"
        b"\n"
        b"From b@x Thu Feb  1 10:01:00 2024\n"
        b"Subject: two\n\nsecond\n"
    )
    msgs = split_mbox(blob)
    assert len(msgs) == 2
    assert b"\nFrom the start of a quoted line" in msgs[0]
    r = parse_message(msgs[0])
    assert r["parse_ok"] and "From the start" in r["body"]


def test_split_rejects_non_mbox():
    assert split_mbox(b"%PDF-1.4 not a mailbox") == []
    assert split_mbox(b"") == []


def test_quoted_printable_charset_decodes():
    raw = (
        b"Subject: =?utf-8?q?caf=C3=A9_report?=\n"
        b"Content-Type: text/plain; charset=\"utf-8\"\n"
        b"Content-Transfer-Encoding: quoted-printable\n\n"
        b"un caf=C3=A9 et une d=C3=A9cision\n"
    )
    r = parse_message(raw)
    assert r["parse_ok"]
    assert r["subject"] == "café report"
    assert "un café et une décision" in r["body"]


def test_html_fallback_strips_tags():
    raw = (
        b"Subject: h\n"
        b"Content-Type: text/html; charset=\"utf-8\"\n\n"
        b"<html><body><p>hello <b>world</b></p></body></html>\n"
    )
    r = parse_message(raw)
    assert r["parse_ok"]
    assert "hello world" in r["body"]
    assert "<" not in r["body"]


def test_garbage_yields_parse_ok_false():
    r = parse_message(
        b"Content-Type: multipart/mixed\n\x00\xff broken"
    )
    # header-only garbage parses as SOMETHING or flags false — but a
    # raising payload must never escape
    assert r["parse_ok"] in (True, False)
    # direct exception path: force a non-bytes failure
    r2 = parse_message(None)  # type: ignore[arg-type]
    assert r2["parse_ok"] is False and r2["n_chars"] is None


def test_read_mbox_distributed_matches_fixture(spark):
    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "mbox")
    df = read_mbox(spark, d)
    rows = {(r["mailbox"], r["seq"]): r for r in df.collect()}
    assert len(rows) == 15
    r = rows[("list2.mbox", 4)]
    assert r["subject"] == "msg 3 of file 2"
    assert r["n_attachments"] == 1 and r["parse_ok"]
    assert r["from_addr"] == "user3@example.com"


def test_read_eml_one_message_per_file(spark, tmp_path):
    for i in range(3):
        with open(tmp_path / f"m{i}.eml", "wb") as fh:
            fh.write(
                f"Subject: eml {i}\nFrom: u{i}@x\n\nbody {i}\n".encode()
            )
    df = read_eml(spark, str(tmp_path))
    rows = {r["mailbox"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows["m1.eml"]["subject"] == "eml 1"
    assert rows["m1.eml"]["seq"] == 1
    assert rows["m2.eml"]["body"].startswith("body 2")
