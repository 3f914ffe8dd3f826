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
