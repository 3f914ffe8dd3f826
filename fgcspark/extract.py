"""Geotag + text extraction from Common-Crawl-style page HTML.

Re-expresses the reference's spatial-input-column contract
(reference R/finbif_geo_convert.R:109-126: resolve lat/lon/footprint
columns, consume, drop) for the graft's page table: lat/lon come from a
``geo.position`` meta tag, the footprint from a ``fgc.footprint`` meta
tag, and the text payload from ``<body>``.

Everything here is JVM-side ``regexp_extract`` over a decoded binary
column — it stays inside whole-stage codegen (no Python at all), which
is the cheapest possible extraction at 100 TB. The byte-identical
extracted-text invariant is tested per url against the generator truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GEO_POS = '<meta name="geo\\.position" content="([^";]+);([^"]+)">'
_FOOTPRINT = '<meta name="fgc\\.footprint" content="([^"]+)">'
_BODY = "(?s)<body>(.*?)</body>"


def _nullif_empty(c: Column) -> Column:
    return F.when(c == "", F.lit(None)).otherwise(c)


def with_extracted(
    df: DataFrame,
    html_col: str = "html",
    lat_col: str = "lat",
    lon_col: str = "lon",
    footprint_col: str = "footprint",
    text_col: str = "extracted_text",
) -> DataFrame:
    """Add lat/lon (string-exact + double), footprint WKT and extracted
    text columns parsed from the html binary column."""
    h = F.decode(F.col(html_col), "UTF-8")
    lat_s = _nullif_empty(F.regexp_extract(h, _GEO_POS, 1))
    lon_s = _nullif_empty(F.regexp_extract(h, _GEO_POS, 2))
    return (
        df.withColumn(lat_col + "_s", lat_s)
        .withColumn(lon_col + "_s", lon_s)
        .withColumn(lat_col, lat_s.cast("double"))
        .withColumn(lon_col, lon_s.cast("double"))
        .withColumn(footprint_col, _nullif_empty(F.regexp_extract(h, _FOOTPRINT, 1)))
        .withColumn(text_col, F.regexp_extract(h, _BODY, 1))
    )
