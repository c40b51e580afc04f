"""Golden-output test for the end-to-end changelog pipeline
(SURVEY.md §5.2 item 3): two synthetic snapshot directories with known
added/removed/renamed/retyped files → assert the exact diff tables."""

from __future__ import annotations

import pytest

from artis_data_ingest_spark.operators.changelog import (
    assess_changes,
    comparable_pairs,
    file_level_log,
)


@pytest.fixture()
def snapshots(tmp_path):
    old = tmp_path / "snap_old"
    new = tmp_path / "snap_new"
    old.mkdir()
    new.mkdir()
    # unchanged pair (version bump only → same standardized key)
    (old / "filtered_Global_production-Quantity_V202301a.csv").write_text(
        "country,qty\nUSA,1\nNOR,2\n"
    )
    (new / "filtered_Global_production-Quantity_V202401a.csv").write_text(
        "country,qty,method\nUSA,1,capture\nNOR,2,farm\nCHL,3,farm\n"
    )
    # removed in new
    (old / "Legacy_table_V202301a.csv").write_text("a,b\n1,2\n")
    # added in new
    (new / "Brand_new_V202401a.csv").write_text("x\n9\n")
    # format-mismatched pair (csv vs xlsx) — must be excluded from deep diff
    (old / "Mixed_format_V202301a.csv").write_text("m\n1\n")
    (new / "Mixed_format_V202401a.xlsx").write_bytes(b"not-a-real-xlsx")
    return str(old), str(new)


def test_file_level_log_golden(spark, snapshots):
    old_dir, new_dir = snapshots
    log = {r.files_std: r for r in file_level_log(spark, old_dir, new_dir).collect()}
    assert set(log) == {
        "global_production_quantity",
        "legacy_table",
        "brand_new",
        "mixed_format",
    }
    gp = log["global_production_quantity"]
    assert gp.exists_in_old and gp.exists_in_new
    assert gp.size_change_mb == pytest.approx(
        gp.size_new_mb - gp.size_old_mb
    )
    assert log["legacy_table"].exists_in_old and not log["legacy_table"].exists_in_new
    assert log["legacy_table"].size_change_mb is None
    assert not log["brand_new"].exists_in_old and log["brand_new"].exists_in_new


def test_comparable_pairs_excludes_mixed_format(spark, snapshots):
    old_dir, new_dir = snapshots
    log = file_level_log(spark, old_dir, new_dir)
    pairs = [r.files_std for r in comparable_pairs(log).collect()]
    assert pairs == ["global_production_quantity"]


def test_assess_changes_deep_diff(spark, snapshots):
    old_dir, new_dir = snapshots
    _, diffs = assess_changes(spark, old_dir, new_dir)
    rows = diffs.collect()
    assert len(rows) == 1
    d = rows[0]
    assert d.files_std == "global_production_quantity"
    assert d.nrow_old == 2 and d.nrow_new == 3 and d.row_diff == 1
    assert d.added_cols == ["method"] and d.removed_cols == []
    assert d.type_changes == []


def test_assess_changes_xlsx_pair_dispatch(spark, tmp_path):
    # mirrors assess_changes.qmd:127-139 — the reader dispatches per
    # extension: fread for csv, read_xlsx(skip=1) for xlsx
    from artis_data_ingest_spark.sources.excel import write_minimal_xlsx

    old = tmp_path / "old"
    new = tmp_path / "new"
    old.mkdir()
    new.mkdir()
    write_minimal_xlsx(
        str(old / "Species_map_V202301.xlsx"),
        [["banner"], ["code", "name"], [1, "cod"], [2, "shrimp"]],
    )
    write_minimal_xlsx(
        str(new / "Species_map_V202401.xlsx"),
        [["banner"], ["code", "group"], [1, "fish"], [2, "crust"], [3, "fish"]],
    )
    _, diffs = assess_changes(spark, str(old), str(new))
    d = diffs.collect()[0]
    assert d.files_std == "species_map"
    assert d.nrow_old == 2 and d.nrow_new == 3
    assert d.added_cols == ["group"] and d.removed_cols == ["name"]


def test_assess_changes_e2e_fixture_tree(spark):
    # committed 3-pair tree: csv pair + xlsx pair compared, the
    # csv-vs-xlsx mismatched pair excluded (qmd:117-123)
    _, diffs = assess_changes(
        spark,
        "/root/repo/data/snapshots_e2e/old",
        "/root/repo/data/snapshots_e2e/new",
    )
    by_key = {r.files_std: r for r in diffs.collect()}
    assert set(by_key) == {"trade_flows", "species_map"}
    assert by_key["species_map"].removed_cols == ["species_major_group"]
    assert by_key["trade_flows"].added_cols == ["flag"]
