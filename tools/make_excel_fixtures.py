"""Generate the committed xlsx fixtures + CSV twins under data/excel/
and the 3-pair changelog-e2e snapshot tree under data/snapshots_e2e/.

Run once; outputs are committed.  The xlsx files are written by the
stdlib writer in sources/excel.py, so the fixture and the reader share
no parsing code beyond the OOXML spec itself (the CSV twins are what
the DuckDB oracle reads — an independent decode path).

Fixture shape mirrors the reference's FAO production workbooks
(assess_changes.qmd:131-138): a one-line title banner (hence
``skip = 1``), a header row, then typed data with NULL holes.
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from artis_data_ingest_spark.sources.excel import write_minimal_xlsx  # noqa: E402

HEADER = ["country", "species_name_en", "scientific_name",
          "species_major_group", "year", "quantity"]

# (country, common, sci, group, year, qty) — includes the reference's
# clean_prod edge cases: ' (=…' synonym suffixes, a PLANTAE AQUATICAE
# row the era filter drops, and a NULL group row R's !%in% keeps.
PROD_V1 = [
    [156, "Atlantic cod", "Gadus morhua (=Gadus callarias)", "PISCES", 2022, 1210.5],
    [840, "Whiteleg shrimp", "Penaeus vannamei", "CRUSTACEA", 2022, 310.25],
    [76, "Nile tilapia", "Oreochromis niloticus", "PISCES", 2022, 4400.75],
    [392, "Japanese carpet shell", "Ruditapes philippinarum", "MOLLUSCA", 2022, 88.5],
    [840, "AQUATIC PLANTS", "Plantae aquaticae", "PLANTAE AQUATICAE", 2022, 12.25],
    [156, "Unidentified fish", "Osteichthyes", None, 2022, 55.125],
    [826, "Atlantic herring", "Clupea harengus", "PISCES", 2022, 903.5],
    [8, "European seabass", "Dicentrarchus labrax (=Labrax lupus)", "PISCES", 2022, 77.75],
]

# V2 drops the 'species_major_group' column (schema change), adds two
# rows and revises one quantity — the deep diff must see all three.
PROD_V2_HEADER = [c for c in HEADER if c != "species_major_group"]
PROD_V2 = [
    [156, "Atlantic cod", "Gadus morhua (=Gadus callarias)", 2023, 1195.5],
    [840, "Whiteleg shrimp", "Penaeus vannamei", 2023, 340.5],
    [76, "Nile tilapia", "Oreochromis niloticus", 2023, 4503.25],
    [392, "Japanese carpet shell", "Ruditapes philippinarum", 2023, 91.0],
    [840, "AQUATIC PLANTS", "Plantae aquaticae", 2023, 14.75],
    [156, "Unidentified fish", "Osteichthyes", 2023, 58.375],
    [826, "Atlantic herring", "Clupea harengus", 2023, 876.25],
    [8, "European seabass", "Dicentrarchus labrax (=Labrax lupus)", 2023, 80.5],
    [604, "Jumbo flying squid", "Dosidicus gigas", 2023, 640.125],
    [704, "Striped catfish", "Pangasianodon hypophthalmus", 2023, 1402.25],
]

TITLE = ["FAO Global Production (tonnes) — snapshot"]

# Fleet fixtures: a directory of per-region workbooks ingested in ONE
# job by read_excel_fleet (binaryFile → mapInPandas).  Each workbook
# carries a leading "Metadata" sheet (like real FAO downloads) so the
# fleet query also exercises sheet-selection-by-name, plus the title
# banner (skip_rows=1) on the data sheet.
FLEET = {
    "capture_atlantic_V202401": [
        [156, "Atlantic cod", "Gadus morhua", "PISCES", 2023, 1195.5],
        [826, "Atlantic herring", "Clupea harengus", "PISCES", 2023, 876.25],
        [8, "European seabass", "Dicentrarchus labrax", "PISCES", 2023, 80.5],
    ],
    "capture_pacific_V202401": [
        [604, "Jumbo flying squid", "Dosidicus gigas", "MOLLUSCA", 2023, 640.125],
        [840, "Whiteleg shrimp", "Penaeus vannamei", "CRUSTACEA", 2023, 340.5],
        [392, "Japanese carpet shell", "Ruditapes philippinarum", "MOLLUSCA", 2023, 91.0],
    ],
    "aquaculture_inland_V202401": [
        [76, "Nile tilapia", "Oreochromis niloticus", "PISCES", 2023, 4503.25],
        [704, "Striped catfish", "Pangasianodon hypophthalmus", "PISCES", 2023, 1402.25],
        [156, "Unidentified fish", "Osteichthyes", None, 2023, 58.375],
        [840, "AQUATIC PLANTS", "Plantae aquaticae", "PLANTAE AQUATICAE", 2023, 14.75],
    ],
}


_CHECK = False
_FAILURES: list = []


def _emit(path: Path, fresh: bytes) -> None:
    """Write, or in --check mode compare against the committed bytes
    (the writers are deterministic — fixed zip timestamps in
    write_minimal_xlsx — so byte equality is the reproducibility
    proof)."""
    if _CHECK:
        status = "OK" if path.read_bytes() == fresh else "MISMATCH"
        if status == "MISMATCH":
            _FAILURES.append(path)
        print(f"{status:9s} {path.relative_to(_REPO)}")
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(fresh)


def _write_xlsx(path: Path, header: list, rows: list) -> None:
    import io

    buf = io.BytesIO()
    write_minimal_xlsx(buf, [TITLE, header, *rows])
    _emit(path, buf.getvalue())


def _write_csv(path: Path, header: list, rows: list) -> None:
    import io

    buf = io.StringIO(newline="")
    w = csv.writer(buf)
    w.writerow(header)
    for r in rows:
        w.writerow(["" if v is None else v for v in r])
    _emit(path, buf.getvalue().encode())


def main() -> int:
    excel = _REPO / "data" / "excel"
    _write_xlsx(excel / "fao_production_V202401.xlsx", HEADER, PROD_V1)
    _write_csv(excel / "fao_production_V202401_twin.csv", HEADER, PROD_V1)

    e2e = _REPO / "data" / "snapshots_e2e"
    old, new = e2e / "old", e2e / "new"

    # pair A: csv-csv, rename-matched, adds a 'flag' column + 1 row
    a_old = [["ARG", 2022, 10.5], ["BRA", 2022, 20.25], ["CHL", 2022, 30.75]]
    a_new = [["ARG", 2023, 11.5, "ok"], ["BRA", 2023, 21.25, "ok"],
             ["CHL", 2023, 29.75, "rev"], ["PER", 2023, 40.5, "new"]]
    _write_csv(old / "filtered_Trade_Flows_V202301.csv",
               ["iso3", "year", "tonnes"], a_old)
    _write_csv(new / "Trade_Flows_V202401a.csv",
               ["iso3", "year", "tonnes", "flag"], a_new)

    # pair B: xlsx-xlsx (title row → skip=1), drops species_major_group
    _write_xlsx(old / "Species_Map_V202301.xlsx", HEADER, PROD_V1)
    _write_xlsx(new / "Species_Map_V202401.xlsx", PROD_V2_HEADER, PROD_V2)
    _write_csv(e2e / "twins" / "Species_Map_old_twin.csv", HEADER, PROD_V1)
    _write_csv(e2e / "twins" / "Species_Map_new_twin.csv",
               PROD_V2_HEADER, PROD_V2)

    # pair C: format mismatch (csv old vs xlsx new) — must be EXCLUDED
    # by comparable_pairs (assess_changes.qmd:117-123)
    _write_csv(old / "Notes_V202301.csv", ["note"], [["a"], ["b"]])
    _write_xlsx(new / "Notes_V202401.xlsx", ["note"], [["a"], ["b"], ["c"]])

    # fleet directory: one multi-sheet workbook per region + CSV twins
    fleet = excel / "fleet"
    twins = excel / "fleet_twins"
    meta = [["generator"], ["FAO FishStat export — regional slice"]]
    for name, rows in FLEET.items():
        import io

        path = fleet / f"{name}.xlsx"
        buf = io.BytesIO()
        write_minimal_xlsx(
            buf,
            {"Metadata": meta, "Production": [TITLE, HEADER, *rows]},
        )
        _emit(path, buf.getvalue())
        _write_csv(twins / f"{name}.csv", HEADER, rows)

    if _CHECK:
        if _FAILURES:
            print(f"\n{len(_FAILURES)} fixture(s) diverge from the generator")
            return 1
        return 0
    print("wrote fixtures under", excel, "and", e2e)
    return 0


if __name__ == "__main__":
    if "--check" in sys.argv:
        _CHECK = True
    sys.exit(main())
