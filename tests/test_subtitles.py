"""SRT/WebVTT ingest tests (sources/subtitles.py)."""

from __future__ import annotations

from artis_data_ingest_spark.sources.subtitles import (
    parse_subtitles,
    read_subtitles,
)


def test_srt_hours_and_multiline():
    cues = parse_subtitles(
        "1\n01:02:03,456 --> 01:02:05,000\nfirst line\nsecond line\n"
        "\n2\n02:00:00,000 --> 02:00:01,500\nshort\n"
    )
    assert cues[0]["start_ms"] == 3723456
    assert cues[0]["end_ms"] == 3725000
    assert cues[0]["text"] == "first line\nsecond line"
    assert cues[1]["duration_ms"] == 1500


def test_vtt_markup_settings_and_notes():
    cues = parse_subtitles(
        "WEBVTT\n\nNOTE a comment\nspanning lines\n\n"
        "intro\n00:05.000 --> 00:07.250 position:10%\n"
        "<v Speaker><i>hi</i> there</v>\n\n"
        "01:00:00.000 --> 01:00:02.000\nwith hours\n"
    )
    assert len(cues) == 2
    assert cues[0]["start_ms"] == 5000
    assert cues[0]["text"] == "hi there"
    assert cues[1]["start_ms"] == 3600000


def test_bom_tolerated_and_srt_comma_or_dot():
    cues = parse_subtitles(
        "﻿1\n00:00:01.000 --> 00:00:02,000\nmixed decimals\n"
    )
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 2000


def test_malformed_cue_is_corrupt_row_not_failure():
    cues = parse_subtitles(
        "1\n00:00:01,000 --> 00:00:02,000\ngood\n\n"
        "2\nnot a timing\nlost\n\n"
        "3\n00:00:05,000 --> 00:00:06,000\nstill lands\n"
    )
    assert [c["_corrupt"] for c in cues] == [False, True, False]
    assert cues[2]["text"] == "still lands"


def test_read_subtitles_distributed(spark, tmp_path):
    (tmp_path / "a.srt").write_text(
        "1\n00:00:00,000 --> 00:00:01,000\nalpha\n"
    )
    (tmp_path / "b.vtt").write_text(
        "WEBVTT\n\n00:02.000 --> 00:03.000\nbeta\n"
    )
    (tmp_path / "c.txt").write_text("ignored")
    df = read_subtitles(spark, str(tmp_path))
    rows = {(r["file"], r["text"]) for r in df.collect()}
    assert rows == {("a.srt", "alpha"), ("b.vtt", "beta")}
