"""Generate the committed subtitle fixtures under data/subs/.

Two SRT files and one WebVTT file, every cue closed-form in (f, i)
so the q_subtitle_ingest oracle recomputes them in SQL:

  * srt{f}.srt, f ∈ {0,1}: cues i=0..3, start 10000·i + 500·f ms,
    end = start + 1500 + 100·i, text "cue {i} of file {f}" plus a
    second line "line two {i}" when i is odd.  srt1.srt appends a
    MALFORMED cue (garbled timing) that must surface as a _corrupt
    row, not kill the file.
  * talk.vtt: WEBVTT header + a NOTE block (skipped), cues i=0..2
    with string identifiers, optional-hours timing, and inline
    markup that must be stripped: "<i>styled {i}</i>" → "styled {i}";
    start 60000·i + 250, end = start + 2000.

Deterministic output — rerunning reproduces the committed bytes.
"""

from __future__ import annotations

import os

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "subs")


def _ts_srt(ms: int) -> str:
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def _ts_vtt(ms: int) -> str:
    m, rem = divmod(ms, 60_000)
    s, ms = divmod(rem, 1000)
    return f"{m:02d}:{s:02d}.{ms:03d}"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for f in range(2):
        path = os.path.join(OUT, f"srt{f}.srt")
        with open(path, "w", newline="\n") as fh:
            for i in range(4):
                start = 10000 * i + 500 * f
                end = start + 1500 + 100 * i
                fh.write(f"{i + 1}\n")
                fh.write(f"{_ts_srt(start)} --> {_ts_srt(end)}\n")
                fh.write(f"cue {i} of file {f}\n")
                if i % 2 == 1:
                    fh.write(f"line two {i}\n")
                fh.write("\n")
            if f == 1:
                fh.write("5\nnot a timing line at all\nlost text\n\n")
        print("wrote", path)
    path = os.path.join(OUT, "talk.vtt")
    with open(path, "w", newline="\n") as fh:
        fh.write("WEBVTT\n\nNOTE this block is metadata, not a cue\n\n")
        for i in range(3):
            start = 60000 * i + 250
            end = start + 2000
            fh.write(f"cue-id-{i}\n")
            fh.write(f"{_ts_vtt(start)} --> {_ts_vtt(end)} "
                     "align:start\n")
            fh.write(f"<i>styled {i}</i>\n\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
