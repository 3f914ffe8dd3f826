"""Unit goldens for the error taxonomy and id/name normalization,
ported from the reference suite (inst/tinytest/test_err.R:1-8 and
inst/tinytest/test_pkg.R:97-105)."""

import pytest

from fgcspark.errors import (
    FgcError,
    error_if,
    format_error,
    read_error_msg,
    sanitise_id,
    sanitise_nms,
)


def test_sanitise_id_digits():
    # reference test_pkg.R:97-100
    assert sanitise_id("645") == {"file": 645, "name": "HBF.645"}


def test_sanitise_id_name():
    # reference test_pkg.R:102-105
    assert sanitise_id("HBF.645") == {
        "file": "https://tun.fi/HBF.645",
        "name": "HBF.645",
    }


def test_error_roundtrip():
    # reference test_err.R:1-8: format then parse back
    msg = format_error("Invalid download request", "invalid_request")
    assert msg == "Invalid download request; err_name: invalid_request"
    parsed = read_error_msg(msg)
    assert parsed == {
        "err_msg": "Invalid download request",
        "err_name": "invalid_request",
    }


def test_error_fallback_name():
    assert read_error_msg("boom")["err_name"] == "error"


def test_error_if_raises():
    with pytest.raises(FgcError) as ei:
        error_if(True, "too large", "file_size")
    assert ei.value.err_name == "file_size"
    assert read_error_msg(str(ei.value))["err_name"] == "file_size"
    error_if(False, "never", "never")  # no raise


def test_sanitise_nms():
    # reference R/finbif_geo_convert.R:97-105: \s -> _, strip \W
    assert sanitise_nms(["YKJ 1km, center", "WGS84 N", "a.b-c"]) == [
        "YKJ_1km_center",
        "WGS84_N",
        "abc",
    ]


def test_conversion_id_deterministic():
    from fgcspark.errors import conversion_id

    a = conversion_id("HBF.53254", "geo=point&crs=wgs84")
    assert a == conversion_id("HBF.53254", "geo=point&crs=wgs84")
    assert a.startswith("HBF.53254-") and len(a.split("-")[-1]) == 8
    assert a != conversion_id("HBF.53254", "geo=bbox&crs=wgs84")
    assert a != conversion_id("HBF.53254", "geo=point&crs=wgs84", salt="x")
