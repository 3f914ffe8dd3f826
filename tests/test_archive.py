"""Citable-archive ingestion (S1 input shapes) + S7 packaging.

Fixture: fgcspark.synth.archive writes an HBF-style zip mirroring the
reference's inst/tinytest/HBF.53254.zip member layout; the reader is
checked for member routing, deselect, Darwin Core renames, fact
enrichment, readme extraction, and the distributed multi-zip path."""

from __future__ import annotations

import zipfile

import pytest

from fgcspark.io.archive import (
    CITABLE_VARS,
    read_citable_zip,
    read_citable_zips_distributed,
    route_members,
    translate_columns,
)
from fgcspark.packaging import extract_readme, package_outputs
from fgcspark.synth.archive import HBF_ID, generate_archive


@pytest.fixture(scope="module")
def archive_dir(tmp_path_factory):
    return generate_archive("sf0.001", tmp_path_factory.mktemp("hbf"), force=True)


@pytest.fixture(scope="module")
def loaded(spark, archive_dir):
    return read_citable_zip(spark, f"{archive_dir}/HBF.{HBF_ID}.zip")


def test_route_members_matches_reference_layout():
    names = [
        f"rows_HBF.{HBF_ID}.tsv",
        f"document_facts_HBF.{HBF_ID}.tsv",
        f"gathering_facts_HBF.{HBF_ID}.tsv",
        f"unit_facts_HBF.{HBF_ID}.tsv",
        f"readme_HBF.{HBF_ID}.txt",
        "something_else.csv",
    ]
    routed = route_members(names)
    assert set(routed) == {
        "rows", "document_facts", "gathering_facts", "unit_facts", "readme"
    }
    assert routed["rows"] == names[0]


def test_translate_spatial_names_dwc():
    # the three names the reference resolves via get_spatial_input_nms
    # (R/finbif_geo_convert.R:109-126) with dwc=TRUE
    got = translate_columns(
        [
            "Gathering.Conversions.WGS84CenterPoint.Lat(N)",
            "Gathering.Conversions.WGS84CenterPoint.Lon(E)",
            "Gathering.Conversions.WGS84_WKT",
        ]
    )
    assert got == ["decimalLatitude", "decimalLongitude", "footprintWKT"]
    # dwc=False keeps finbif short names
    got = translate_columns(["Gathering.Conversions.WGS84CenterPoint.Lat(N)"], dwc=False)
    assert got == ["lat_wgs84"]


def test_load_shape_and_deselect(loaded):
    rows, readme = loaded
    cols = set(rows.columns)
    # DwC renames present
    assert {"occurrenceID", "decimalLatitude", "decimalLongitude", "footprintWKT"} <= cols
    # deselect list dropped (bbox variants were in the fixture TSV)
    assert not {"lat_min_wgs84", "lat_max_wgs84", "lon_min_wgs84", "lon_max_wgs84"} & cols
    # unmapped passthrough column survives sanitised
    assert "UnitNotes" in cols
    # fact columns pivoted in, sanitised
    assert {"Havainnon_laatu", "Vesistöalue", "Seurattava_laji"} <= cols
    assert readme and f"HBF.{HBF_ID}" in readme


def test_fact_values_from_correct_level(spark, loaded):
    rows, _ = loaded
    pdf = rows.select(
        "occurrenceID", "eventID", "Vesistöalue"
    ).toPandas()
    # event-level fact must be constant within one gathering
    got = pdf.dropna(subset=["Vesistöalue"]).groupby("eventID")["Vesistöalue"].nunique()
    assert (got <= 1).all()


def test_distributed_zip_reader(spark, archive_dir, loaded):
    rows, _ = loaded
    want = [
        "Unit.UnitID",
        "Gathering.Conversions.WGS84CenterPoint.Lat(N)",
        "Gathering.Conversions.WGS84CenterPoint.Lon(E)",
    ]
    dist = read_citable_zips_distributed(
        spark, f"{archive_dir}/HBF.{HBF_ID}.zip", want
    )
    assert dist.columns == ["occurrenceID", "decimalLatitude", "decimalLongitude", "archive"]
    assert dist.count() == rows.count()
    # same ids as the single-archive path
    a = {r["occurrenceID"] for r in dist.select("occurrenceID").collect()}
    b = {r["occurrenceID"] for r in rows.select("occurrenceID").collect()}
    assert a == b


def test_packaging_bundle(archive_dir, tmp_path):
    work = tmp_path / "conv1"
    work.mkdir()
    (work / "out_points.geojson").write_text('{"type":"FeatureCollection"}')
    (work / "progress.txt").write_text("10\n")
    (work / "occurrences.txt").write_text("scratch")
    sub = work / "additional_file_1"
    sub.mkdir()
    (sub / "chunk.gpkg").write_text("x")
    # S7 step 1: readme from the ORIGINAL archive (api.R:236-240)
    readme = extract_readme(f"{archive_dir}/HBF.{HBF_ID}.zip", work)
    assert readme is not None and readme.name == f"readme_HBF.{HBF_ID}.txt"
    # S7 step 2: bundle, excluding scratch + chunk dirs (api.R:244-259)
    z = package_outputs(work, f"HBF.{HBF_ID}", "geojson", exclude=["progress.txt"])
    with zipfile.ZipFile(z) as zf:
        names = set(zf.namelist())
    assert names == {"out_points.geojson", f"readme_HBF.{HBF_ID}.txt"}


def test_citable_vars_cover_reference_deselect():
    # every wgs84/euref/ykj bbox variant in the reference's deselect
    # list resolves from some citable header (fidelity check)
    short = set(CITABLE_VARS.values())
    for v in [
        "lat_min_wgs84", "lat_max_wgs84", "lon_min_wgs84", "lon_max_wgs84",
        "lat_euref", "lon_euref", "lat_min_euref", "lat_max_euref",
        "lon_min_euref", "lon_max_euref", "lat_min_ykj", "lat_max_ykj",
        "lon_min_ykj", "lon_max_ykj",
    ]:
        assert v in short, v


def test_lite_tsv_reader(spark, tmp_path):
    from fgcspark.io.archive import read_lite_tsv

    # headers drawn from the reference's 58/59-col lite downloads
    hdr = [
        "Observation identifier", "Scientific name", "Number", "Time",
        "Municipality", "WGS84 WKT", "WGS84 N-min", "WGS84 N-max",
        "WGS84 E-min", "WGS84 E-max", "ETRS-TM35FIN N", "ETRS-TM35FIN E",
        "Red List category in Finland",
    ]
    lines = ["\t".join(hdr)]
    lines.append(
        "\t".join([
            "http://tun.fi/JX.1#1", "species_01", "2", "2021-06-08",
            "kunta_01", "POINT (24.5 60.5)", "60.49", "60.51",
            "24.49", "24.51", "6705000", "470000", "LC",
        ])
    )
    p = tmp_path / "lite.tsv"
    p.write_text("\n".join(lines) + "\n")
    df = read_lite_tsv(spark, str(p))
    cols = set(df.columns)
    assert {"occurrenceID", "scientificName", "footprintWKT"} <= cols
    # bbox + euref variants deselected; extra column passes through
    assert not {"lat_min_wgs84", "lat_euref", "lon_euref"} & cols
    assert "Red_List_category_in_Finland" in cols
    row = df.collect()[0]
    assert row["footprintWKT"] == "POINT (24.5 60.5)"
    assert row["occurrenceID"] == "http://tun.fi/JX.1#1"


def test_convert_citable_end_to_end(spark, archive_dir):
    from fgcspark.pipeline import convert_citable

    df, readme = convert_citable(
        spark, f"{archive_dir}/HBF.{HBF_ID}.zip", geo="point", crs="wgs84"
    )
    assert readme and f"HBF.{HBF_ID}" in readme
    assert {"geo_wkt", "geom_type"} <= set(df.columns)
    rows = df.select("geom_type", "geo_wkt").collect()
    assert all(r["geom_type"] == "POINT" for r in rows)
    # rows without coords fall back to the footprint centroid (G3);
    # every fixture row carries coords or a footprint, so none is EMPTY
    assert sum(r["geo_wkt"] == "POINT EMPTY" for r in rows) == 0
    # spatial input columns consumed (P3)
    assert not {"lat", "lon", "footprint"} & set(df.columns)


def test_poll_status_envelope(tmp_path):
    """Reference /status/{id} + /output/{id} response envelopes
    (api.R:288-412): 404 / 400-error / 303-complete / 200-pending with
    the exact timeout clamp min(max(t-1, sleep), 60)."""
    from fgcspark.packaging import output_response, poll_status

    # 404: no such conversion dir
    r = poll_status(tmp_path / "nope")
    assert r == {"status_code": 404, "body": "File not found"}
    assert output_response(tmp_path / "nope")["status_code"] == 404

    # 200 pending: dir exists, no bundle yet; progress file read back
    d = tmp_path / "conv1"
    d.mkdir()
    (d / "progress").write_text("40\n")
    r = poll_status(d, timeout=0.0, sleep=0.01)  # clamps to one tick
    assert r["status_code"] == 200
    assert r["body"] == {"id": "conv1", "status": "pending", "progress_percent": 40}
    assert output_response(d)["status_code"] == 404  # no bundle yet

    # 400: error.txt parsed through the reference error taxonomy
    (d / "error.txt").write_text("Format not supported; err_name: not_supported")
    r = poll_status(d, timeout=0.0, sleep=0.01)
    assert r["status_code"] == 400
    assert r["body"]["err_name"] == "not_supported"
    assert r["body"]["err_msg"] == "Format not supported"

    # error OVERRIDES a bundle discovered in the same tick (api.R order)
    (d / "HBF.1_geo_gpkg.zip").write_bytes(b"PK")
    r = poll_status(d, timeout=0.0, sleep=0.01)
    assert r["status_code"] == 400

    # 303 complete once the error clears: Location + progress 100
    (d / "error.txt").unlink()
    r = poll_status(d, timeout=0.0, sleep=0.01)
    assert r["status_code"] == 303
    assert r["location"] == "/output/conv1"
    assert r["body"] == {"id": "conv1", "status": "complete", "progress_percent": 100}
    out = output_response(d)
    assert out["status_code"] == 200
    assert out["attachment"].endswith("HBF.1_geo_gpkg.zip")
    assert out["content_type"] == "application/zip"


def test_poll_status_timeout_clamp():
    """The clamp arithmetic itself (api.R:313-315): requested timeouts
    above 60 s are capped, below-sleep floors to one sleep tick."""
    from fgcspark.packaging import poll_status
    import time

    # cap at 60: a missing-bundle dir with a huge requested timeout
    # must NOT wait minutes — use tiny sleep so eff=min(max(1e6-1,s),60)
    # would still be 60; instead verify the pending path returns fast
    # when the clamp floor applies (timeout=0 -> eff=sleep)
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        r = poll_status(Path(td), timeout=0.0, sleep=0.01)
        assert r["status_code"] == 200 and r["body"]["status"] == "pending"
        assert time.time() - t0 < 1.0


def test_pivot_facts_typed_surfaces_native_types(spark):
    from pyspark.sql import types as T

    from fgcspark.facts import pivot_facts_typed

    rows = [
        # (Parent, Fact, Value, IntValue, DecimalValue, ord)
        ("p1", "laatu", "good", 0, 0.0, 2),
        ("p1", "laatu", "FIRST", 0, 0.0, 1),   # min ord wins
        ("p1", "klass", "3", 3, 3.0, 1),
        ("p2", "depth", "1.5", 1, 1.5, 1),
        ("p2", "noise", "x", 9, 9.9, 1),       # not in schema -> ignored
    ]
    df = spark.createDataFrame(
        rows, "Parent string, Fact string, Value string, IntValue long, DecimalValue double, ord long"
    )
    out = pivot_facts_typed(
        df,
        {"laatu": "Value", "klass": "IntValue", "depth": "DecimalValue"},
        order_col="ord",
    )
    schema = {f.name: f.dataType for f in out.schema.fields}
    assert schema["laatu"] == T.StringType()
    assert schema["klass"] == T.LongType()
    assert schema["depth"] == T.DoubleType()
    got = {r.Parent: (r.laatu, r.klass, r.depth) for r in out.collect()}
    assert got["p1"] == ("FIRST", 3, None)
    assert got["p2"] == (None, None, 1.5)
