"""Generate the committed zip-ingest fixtures under data/zips/.

The loose CSVs in data/zips/twins/ are the source of truth: each is
zipped (with a decoy non-CSV member) into data/zips/*.zip, so the
q_zip_ingest oracle reads the twins with DuckDB read_csv while Spark
reads the archives through the mapInPandas unzip path — independent
decode routes over byte-identical content.

Byte-reproducible (r11): every zip entry carries a FIXED timestamp
(the sources/excel.py / sources/docx.py discipline — ``zf.write``
would embed the twin file's mtime and make the committed bytes depend
on checkout time).  ``--check`` verifies the committed files
regenerate byte-identically without writing.
"""

from __future__ import annotations

import csv
import io
import sys
import zipfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

MEMBERS = {
    "trade_2023.csv": [
        ["iso3", "year", "tonnes", "flag"],
        ["ARG", 2023, 110.5, "ok"],
        ["BRA", 2023, 220.25, "ok"],
        ["CHL", 2023, 330.75, "rev"],
    ],
    "trade_2024.csv": [
        ["iso3", "year", "tonnes", "flag"],
        ["ARG", 2024, 115.25, "ok"],
        ["PER", 2024, 440.5, "new"],
        ["CHL", 2024, 325.0, "ok"],
        ["ECU", 2024, 90.125, "new"],
    ],
}


def _entry(name: str) -> zipfile.ZipInfo:
    info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
    info.compress_type = zipfile.ZIP_DEFLATED
    info.external_attr = 0o600 << 16
    return info


def _csv_bytes(rows: list) -> bytes:
    buf = io.StringIO(newline="")
    csv.writer(buf).writerows(rows)
    return buf.getvalue().encode()


def _archive_bytes(name: str, rows: list) -> bytes:
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_entry(name), _csv_bytes(rows))
        zf.writestr(
            _entry("README.txt"), "decoy member; ingest must skip it"
        )
    return zbuf.getvalue()


def main(check_only: bool) -> int:
    zdir = _REPO / "data" / "zips"
    twins = zdir / "twins"
    failures = []
    jobs: list[tuple[Path, bytes]] = []
    for name, rows in MEMBERS.items():
        jobs.append((twins / name, _csv_bytes(rows)))
        jobs.append(
            (zdir / name.replace(".csv", ".zip"),
             _archive_bytes(name, rows))
        )
    for target, fresh in jobs:
        if check_only:
            committed = target.read_bytes()
            status = "OK" if committed == fresh else "MISMATCH"
            if status == "MISMATCH":
                failures.append(target)
            print(f"{status:9s} {target.relative_to(_REPO)}")
        else:
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_bytes(fresh)
            print(f"wrote     {target.relative_to(_REPO)}")
    if failures:
        print(f"\n{len(failures)} fixture(s) diverge from the generator")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(check_only="--check" in sys.argv))
