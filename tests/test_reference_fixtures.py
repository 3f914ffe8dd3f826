"""Pin the archive readers against the REFERENCE'S OWN fixtures
(read-only at /root/reference/inst/tinytest/) — the real 119-column
citable headers, real Finnish fact names, and the GC-heavy 55685
archive the reference itself tests with (test_pkg.R). Skipped when the
reference tree is absent, so the suite stays self-contained elsewhere.

These are the tests README.md's validation claim refers to; the row
counts / fact values asserted here were read straight from the
fixtures, not from this engine's own output.
"""

from __future__ import annotations

from pathlib import Path

import pytest

FIX = Path("/root/reference/inst/tinytest")

pytestmark = pytest.mark.skipif(
    not FIX.is_dir(), reason="reference fixture tree not available"
)


def test_citable_zip_53254_rows_and_facts(spark, tmp_path):
    from fgcspark.io.archive import read_citable_zip

    df, readme = read_citable_zip(
        spark, str(FIX / "HBF.53254.zip"), extract_dir=str(tmp_path)
    )
    assert readme and "HBF.53254" in readme
    # rows_HBF.53254.tsv: 9707 data rows, 119 raw columns
    assert df.count() == 9707
    cols = set(df.columns)
    # Darwin Core names applied to the mapped subset
    assert {
        "occurrenceID",
        "scientificName",
        "decimalLatitude",
        "decimalLongitude",
        "footprintWKT",
    } <= cols
    # deselect list dropped every bbox/euref/ykj variant
    assert not {"lat_min_wgs84", "lat_euref", "lon_min_ykj"} & cols
    # whitelisted Finnish fact names pivoted into (sanitised) columns
    assert {
        "Havainnon_määrän_yksikkö",
        "Sijainnin_tarkkuusluokka",
        "Seurattava_laji",
    } <= cols
    # a fact value sampled from unit_facts_HBF.53254.tsv by hand:
    # Parent http://tun.fi/KE.921/LGE.207403/356826 carries
    # 'Havainnon määrän yksikkö' = 'yksilö (aikuinen)'
    row = df.filter(
        df["occurrenceID"] == "http://tun.fi/KE.921/LGE.207403/356826"
    ).collect()
    assert len(row) == 1
    assert row[0]["Havainnon_määrän_yksikkö"] == "yksilö (aikuinen)"
    assert row[0]["scientificName"] == "Glaucopsyche alexis"


def test_citable_zip_55685_rowcount(spark, tmp_path):
    from fgcspark.io.archive import read_citable_zip

    df, _ = read_citable_zip(
        spark, str(FIX / "HBF.55685.zip"), extract_dir=str(tmp_path)
    )
    assert df.count() == 20580


def test_convert_citable_footprint_over_gc_heavy_55685(spark, tmp_path):
    """End-to-end geo=footprint over the reference's geometry-heavy
    archive: 13,888 POLYGON / 5,152 POINT / 1,163 LINESTRING / 377
    GEOMETRYCOLLECTION input footprints (counted from the raw TSV).
    Every GC must be homogenized away (G5) and every row must land in
    a concrete layer type."""
    from pyspark.sql import functions as F

    from fgcspark.pipeline import convert_citable

    df, readme = convert_citable(
        spark, str(FIX / "HBF.55685.zip"), geo="footprint", crs="wgs84"
    )
    assert readme and "HBF.55685" in readme
    counts = {
        r["geom_type"]: r["n"]
        for r in df.groupBy("geom_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(counts.values()) == 20580
    # GC homogenization (G5): no collection survives to the layer stage
    assert "GEOMETRYCOLLECTION" not in counts
    assert not any(t is None or t == "" for t in counts)
    # homogenized outputs are cast to MULTI (G8) or stay simple; the
    # concrete set must be drawn from the known layer families
    allowed = {
        "POINT",
        "MULTIPOINT",
        "LINESTRING",
        "MULTILINESTRING",
        "POLYGON",
        "MULTIPOLYGON",
    }
    assert set(counts) <= allowed


def test_readme_only_archive_6968_raises(spark, tmp_path):
    from fgcspark.io.archive import read_citable_zip

    with pytest.raises(FileNotFoundError):
        read_citable_zip(spark, str(FIX / "HBF.6968.zip"), extract_dir=str(tmp_path))


def test_lite_tsv_real_files(spark):
    from fgcspark.io.archive import read_lite_tsv

    df1 = read_lite_tsv(spark, str(FIX / "laji-data.tsv"))
    df2 = read_lite_tsv(spark, str(FIX / "laji-data2.tsv"))
    # NOT the naive line counts (934 / 1282 physical lines): lite files
    # quote free-text fields that embed literal newlines, so the
    # logical record counts under the reference's read.delim semantics
    # are 902 and 1225 (verified with an independent quote-aware csv
    # parse: every laji-data.tsv record resolves to exactly 58 fields)
    assert df1.count() == 902
    assert df2.count() == 1225
    for df in (df1, df2):
        cols = set(df.columns)
        assert {"occurrenceID", "scientificName", "footprintWKT"} <= cols
        assert not {"lat_min_wgs84", "lat_euref"} & cols
    # every lite row carries a parseable footprint — the G3 centroid-
    # fallback input the reference routes them through. Independently
    # counted from the raw file: 618 POINT / 159 POLYGON /
    # 100 LINESTRING / 25 GEOMETRYCOLLECTION = 902
    from pyspark.sql import functions as F

    dist = {
        r["t"]: r["n"]
        for r in df1.groupBy(
            F.regexp_extract("footprintWKT", "^([A-Z]+)", 1).alias("t")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert dist == {
        "POINT": 618,
        "POLYGON": 159,
        "LINESTRING": 100,
        "GEOMETRYCOLLECTION": 25,
    }


def test_resolve_input_id_routes(spark, tmp_path):
    """The reference's id input surface (R/sanitise_id.R feeding the
    load path): bare integer, HBF id, and tun.fi URI all resolve to
    HBF.<id>.zip in the local cache dir; a cache miss raises the error
    taxonomy instead of attempting a network fetch."""
    from fgcspark.errors import FgcError, read_error_msg
    from fgcspark.io.archive import resolve_input

    for ident in ("53254", "HBF.53254", "https://tun.fi/HBF.53254"):
        path, name = resolve_input(ident, cache_dir=str(FIX))
        assert path == str(FIX / "HBF.53254.zip")
        assert name == "HBF.53254"
    # direct paths pass through, zip or tsv
    p, n = resolve_input(str(FIX / "laji-data.tsv"))
    assert p.endswith("laji-data.tsv") and n == "laji-data"
    with pytest.raises(FgcError) as ei:
        resolve_input("99999", cache_dir=str(FIX))
    assert read_error_msg(str(ei.value))["err_name"] == "fs_error"
    with pytest.raises(FgcError):
        resolve_input("no/such/file.zip")


def test_convert_occurrences_lite_tsv_centroid_fallback(spark):
    """finbif_geo_convert('laji-data.tsv') twin: lite rows have no
    centre point, so every point comes from the footprint centroid
    (G3); no row may end up EMPTY because every lite fixture row
    carries a parseable footprint."""
    from pyspark.sql import functions as F

    from fgcspark.pipeline import convert_occurrences

    df, readme, name = convert_occurrences(
        spark, str(FIX / "laji-data.tsv"), geo="point", crs="wgs84"
    )
    assert readme is None and name == "laji-data"
    assert df.filter(F.col("geo_wkt") == "POINT EMPTY").count() == 0
    assert df.count() == 902
    got = {r["geom_type"] for r in df.select("geom_type").distinct().collect()}
    assert got == {"POINT"}


def test_convert_occurrences_by_id_from_cache(spark):
    from fgcspark.pipeline import convert_occurrences

    df, readme, name = convert_occurrences(
        spark, "HBF.53254", geo="point", cache_dir=str(FIX)
    )
    assert name == "HBF.53254" and readme and "HBF.53254" in readme
    assert df.count() == 9707


def test_drop_na_and_drop_facts_na_column_switches(spark, tmp_path):
    """S1 option twins (api.R:158-162 passes drop_na=FALSE,
    drop_facts_na=FALSE per chunk; semantics are finbif
    finbif_occurrence_load's all-NA COLUMN removal). On HBF.53254:
    23 raw row columns are entirely NA, and 4 whitelisted facts
    ('Havainnon laatu', 'Museo...', 'Vesistöalue', 'Pesintätulos')
    are absent from the fact members so their pivoted columns are
    all-NA — drop_na removes all 27, drop_facts_na only the 4."""
    from fgcspark.io.archive import read_citable_zip

    base, _ = read_citable_zip(
        spark, str(FIX / "HBF.53254.zip"), extract_dir=str(tmp_path / "a")
    )
    dropped, _ = read_citable_zip(
        spark,
        str(FIX / "HBF.53254.zip"),
        extract_dir=str(tmp_path / "b"),
        drop_na=True,
    )
    facts_only, _ = read_citable_zip(
        spark,
        str(FIX / "HBF.53254.zip"),
        extract_dir=str(tmp_path / "c"),
        drop_facts_na=True,
    )
    n_base = len(base.columns)
    assert len(dropped.columns) == n_base - 27
    assert len(facts_only.columns) == n_base - 4
    gone_facts = {
        "Havainnon_laatu",
        "Museo_johon_lajista_kerätty_näyte_on_talletettu",
        "Vesistöalue",
        "Pesintätulos",
    }
    assert gone_facts <= set(base.columns) - set(facts_only.columns)
    # populated facts survive both switches
    assert "Havainnon_määrän_yksikkö" in dropped.columns
    assert "Sijainnin_tarkkuusluokka" in facts_only.columns
    # row count untouched: these are column switches, not row filters
    assert dropped.count() == 9707
