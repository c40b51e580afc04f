#!/usr/bin/env python
"""Generate the committed binary ``.xls`` (BIFF8) fixtures under
data/xls/ plus their CSV twins under data/xls_twins/ — the
q_excel_fleet pattern applied to the pre-2007 format: the workbooks
are written by the stdlib BIFF8 writer in sources/xls.py, the twins
are what the DuckDB oracle reads, so reader and oracle share no
decode path.

Deterministic: zero CFB timestamps, no environment-dependent records;
a rerun is byte-identical (`--check` verifies without writing).
"""

from __future__ import annotations

import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from artis_data_ingest_spark.sources.xls import write_minimal_xls  # noqa: E402

HEADER = ["country", "species_name_en", "year", "quantity"]
TITLE = ["FAO Global Capture (tonnes) — legacy BIFF8 export"]

#: per-region rows: ints ride RK records, floats NUMBER records,
#: strings the SST (one non-latin1 name exercises the UTF-16 path),
#: and one None hole per workbook exercises sparse densify
FLEETS = {
    "capture_baltic_V199902": [
        [208, "Atlantic cod", 1998, 104250.5],
        [752, "European sprat", 1998, 212400.25],
        [233, "Baltic herring", 1998, 33210.75],
        [208, None, 1998, 55.125],
    ],
    "capture_med_V199902": [
        [300, "European anchovy", 1998, 81520.5],
        [380, "Sardina pilchardus", 1998, 44310.25],
        [792, "Sardina pilchardus", 1998, 17805.5],
        [724, "Merlucho — añejo", 1998, 9905.75],
    ],
    "capture_nordic_V199902": [
        [578, "Atlantic herring", 1998, 612300.5],
        [352, "Atlantic cod", 1998, 204100.25],
        [578, "Blue whiting", 1998, None],
        [246, "Baltic herring", 1998, 90410.125],
    ],
}


def main(check_only: bool) -> int:
    xls_dir = os.path.join(REPO, "data", "xls")
    twin_dir = os.path.join(REPO, "data", "xls_twins")
    os.makedirs(xls_dir, exist_ok=True)
    os.makedirs(twin_dir, exist_ok=True)
    failures = []
    for name, rows in FLEETS.items():
        sheets = {
            "Metadata": [["source", name], ["format", "BIFF8"]],
            "Production": [TITLE, HEADER] + rows,
        }
        import io

        buf = io.BytesIO()
        write_minimal_xls(buf, sheets)
        fresh = buf.getvalue()
        target = os.path.join(xls_dir, f"{name}.xls")
        twin = os.path.join(twin_dir, f"{name}.csv")
        tw = io.StringIO()
        w = csv.writer(tw, lineterminator="\n")
        w.writerow(HEADER)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])
        twin_fresh = tw.getvalue()
        if check_only:
            with open(target, "rb") as f:
                if f.read() != fresh:
                    failures.append(target)
            with open(twin) as f:
                if f.read() != twin_fresh:
                    failures.append(twin)
        else:
            with open(target, "wb") as f:
                f.write(fresh)
            with open(twin, "w") as f:
                f.write(twin_fresh)
            print(f"wrote     {os.path.relpath(target, REPO)}")
            print(f"wrote     {os.path.relpath(twin, REPO)}")
    if failures:
        print("STALE:", *failures, sep="\n  ")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main("--check" in sys.argv))
