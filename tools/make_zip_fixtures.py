"""Generate the committed zip-ingest fixtures under data/zips/.

The loose CSVs in data/zips/twins/ are the source of truth: each is
zipped (with a decoy non-CSV member) into data/zips/*.zip, so the
q_zip_ingest oracle reads the twins with DuckDB read_csv while Spark
reads the archives through the mapInPandas unzip path — independent
decode routes over byte-identical content.  Run once; outputs are
committed.
"""

from __future__ import annotations

import csv
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


def main() -> None:
    zdir = _REPO / "data" / "zips"
    twins = zdir / "twins"
    twins.mkdir(parents=True, exist_ok=True)
    for name, rows in MEMBERS.items():
        with open(twins / name, "w", newline="") as f:
            csv.writer(f).writerows(rows)
        with zipfile.ZipFile(
            zdir / name.replace(".csv", ".zip"), "w", zipfile.ZIP_DEFLATED
        ) as zf:
            zf.write(twins / name, arcname=name)
            zf.writestr("README.txt", "decoy member; ingest must skip it")
    print("wrote", len(MEMBERS), "archives under", zdir)


if __name__ == "__main__":
    main()
