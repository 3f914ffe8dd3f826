"""Citable-archive ingestion: the reference's real input shapes.

The reference accepts a laji.fi "citable download" Zip
(inst/tinytest/HBF.53254.zip: `rows_HBF.<id>.tsv` + three long fact
TSVs `document/gathering/unit_facts_HBF.<id>.tsv` + `readme_*.txt`)
or a lite TSV, loads it with finbif::finbif_occurrence_load
(R/finbif_geo_convert.R:78-94), sanitises names, and optionally maps
them to Darwin Core (R/finbif_geo_convert.R:109-126, finbif::to_dwc).

This module re-expresses that surface Spark-first:

- `route_members` — member-name routing, same patterns the reference
  relies on (api.R:236-240 greps `^readme.*\\.txt$`; finbif routes
  `rows_` / `*_facts_` members);
- `read_citable_zip` — ONE archive (the reference's unit of work):
  driver-side member extraction, then `spark.read.csv` per member so
  the row table is a normal splittable scan; facts pivot + broadcast
  enrichment reuse fgcspark.facts; header translation -> finbif-style
  short names -> optional Darwin Core;
- `read_citable_zips_distributed` — the 100 TB path the reference
  lacks: a DIRECTORY of archives scanned with binaryFile, members
  unzipped and parsed inside executors via mapInPandas (one task per
  archive, no driver involvement, no shuffle).

Column-translation fidelity: CITABLE_VARS covers the spatial columns
the geo pipeline consumes (the reference's get_spatial_input_nms
names: lat_wgs84 / lon_wgs84 / footprint_wgs84) plus the id /
taxon / date columns its tests touch, and every bbox/euref/ykj
variant named in the reference's `deselect` list
(R/finbif_geo_convert.R:633-639). Unmapped headers pass through
name-sanitised (P2), exactly like finbif keeps unknown columns.
"""

from __future__ import annotations

import io
import re
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fgcspark.errors import sanitise_nms
from fgcspark.facts import join_facts

# citable rows-TSV header -> finbif-style short name (subset; see
# module docstring for the fidelity contract)
CITABLE_VARS = {
    "Unit.UnitID": "record_id",
    "Gathering.GatheringID": "event_id",
    "Document.DocumentID": "document_id",
    "Taxon.ScientificName": "scientific_name",
    "Unit.Abundance": "abundance",
    "Unit.Interpretations.IndividualCount": "individual_count",
    "Gathering.DisplayDateTime": "date_time",
    "Gathering.Interpretations.Municipality": "municipality",
    "Gathering.Interpretations.CoordinateAccuracy": "coordinates_uncertainty",
    "Gathering.Conversions.WGS84CenterPoint.Lat(N)": "lat_wgs84",
    "Gathering.Conversions.WGS84CenterPoint.Lon(E)": "lon_wgs84",
    "Gathering.Conversions.WGS84_WKT": "footprint_wgs84",
    "Gathering.Conversions.WGS84.LatMin(N)": "lat_min_wgs84",
    "Gathering.Conversions.WGS84.LatMax(N)": "lat_max_wgs84",
    "Gathering.Conversions.WGS84.LonMin(E)": "lon_min_wgs84",
    "Gathering.Conversions.WGS84.LonMax(E)": "lon_max_wgs84",
    "Gathering.Conversions.ETRS-TM35FINCenterPoint.Lat(N)": "lat_euref",
    "Gathering.Conversions.ETRS-TM35FINCenterPoint.Lon(E)": "lon_euref",
    "Gathering.Conversions.ETRS-TM35FIN.LatMin(N)": "lat_min_euref",
    "Gathering.Conversions.ETRS-TM35FIN.LatMax(N)": "lat_max_euref",
    "Gathering.Conversions.ETRS-TM35FIN.LonMin(E)": "lon_min_euref",
    "Gathering.Conversions.ETRS-TM35FIN.LonMax(E)": "lon_max_euref",
    "Gathering.Conversions.YKJ.LatMin(N)": "lat_min_ykj",
    "Gathering.Conversions.YKJ.LatMax(N)": "lat_max_ykj",
    "Gathering.Conversions.YKJ.LonMin(E)": "lon_min_ykj",
    "Gathering.Conversions.YKJ.LonMax(E)": "lon_max_ykj",
}

# lite-download TSV header -> finbif short name (the 58/59-column
# files of inst/tinytest/laji-data.tsv / laji-data2.tsv). Lite files
# carry no WGS84 centre point: the geometry comes from "WGS84 WKT"
# (footprint), with the bbox / euref / ykj variants deselected on
# load like the citable shape — so a lite row flows through the
# pipeline's centroid-fallback path (G3), same as the reference.
LITE_VARS = {
    "Observation identifier": "record_id",
    "Submission identifier": "document_id",
    "Scientific name": "scientific_name",
    "Number": "abundance",
    "Individual count (interpreted)": "individual_count",
    "Time": "date_time",
    "Municipality": "municipality",
    "Location accuracy (m)": "coordinates_uncertainty",
    "WGS84 WKT": "footprint_wgs84",
    "WGS84 N-min": "lat_min_wgs84",
    "WGS84 N-max": "lat_max_wgs84",
    "WGS84 E-min": "lon_min_wgs84",
    "WGS84 E-max": "lon_max_wgs84",
    "ETRS-TM35FIN N": "lat_euref",
    "ETRS-TM35FIN E": "lon_euref",
    "ETRS-TM35FIN N-min": "lat_min_euref",
    "ETRS-TM35FIN N-max": "lat_max_euref",
    "ETRS-TM35FIN E-min": "lon_min_euref",
    "ETRS-TM35FIN E-max": "lon_max_euref",
    "YKJ N-Min": "lat_min_ykj",
    "YKJ N-Max": "lat_max_ykj",
    "YKJ E-Min": "lon_min_ykj",
    "YKJ E-Max": "lon_max_ykj",
}

# finbif::to_dwc for the columns above (public Darwin Core terms)
TO_DWC = {
    "record_id": "occurrenceID",
    "event_id": "eventID",
    "document_id": "datasetID",
    "scientific_name": "scientificName",
    "abundance": "organismQuantity",
    "individual_count": "individualCount",
    "date_time": "eventDate",
    "municipality": "municipality",
    "coordinates_uncertainty": "coordinateUncertaintyInMeters",
    "lat_wgs84": "decimalLatitude",
    "lon_wgs84": "decimalLongitude",
    "footprint_wgs84": "footprintWKT",
}

# reference deselect list (R/finbif_geo_convert.R:633-639): redundant
# bbox / euref / ykj coordinate variants dropped on load
DESELECT = [
    "lon_min_wgs84", "lat_min_wgs84", "lon_max_wgs84", "lat_max_wgs84",
    "lat_euref", "lon_euref", "lon_min_euref", "lat_min_euref",
    "lon_max_euref", "lat_max_euref", "lon_min_ykj", "lat_min_ykj",
    "lon_max_ykj", "lat_max_ykj", "coordinates_euref",
]

# reference fact whitelist (R/finbif_geo_convert.R:641-653):
# record -> unit_facts, event -> gathering_facts, document ->
# document_facts members
FACTS = {
    "record": [
        "Havainnon laatu",
        "Havainnon määrän yksikkö",
        "Museo, johon lajista kerätty näyte on talletettu",
    ],
    "event": ["Vesistöalue", "Sijainnin tarkkuusluokka", "Pesintätulos"],
    "document": ["Seurattava laji"],
}

_MEMBER_PATTERNS = {
    "rows": re.compile(r"^rows_.*\.tsv$"),
    "document_facts": re.compile(r"^document_facts_.*\.tsv$"),
    "gathering_facts": re.compile(r"^gathering_facts_.*\.tsv$"),
    "unit_facts": re.compile(r"^unit_facts_.*\.tsv$"),
    "readme": re.compile(r"^readme.*\.txt$"),
}

_FACT_MEMBER = {
    "record": ("unit_facts", "record_id"),
    "event": ("gathering_facts", "event_id"),
    "document": ("document_facts", "document_id"),
}


def resolve_input(x: str, cache_dir: str | None = None) -> tuple[str, str]:
    """The reference's input routing (R/finbif_geo_convert.R:80-86 via
    R/sanitise_id.R): an existing file path loads directly; a bare
    integer id ('645'), an HBF id ('HBF.645'), or a tun.fi URI
    ('https://tun.fi/HBF.645') resolves to the citable archive
    `HBF.<id>.zip` inside `cache_dir` — the local twin of finbif's
    download cache. The reference's OWN test run uses exactly this
    no-network contract (inst/tinytest/test_pkg.R sets
    finbif_cache_path='cache' and finbif_allow_query=FALSE); there is
    no network in this engine either, so a cache miss raises the
    reference's not-found taxonomy instead of fetching.

    Returns (path, dataset_name)."""
    from fgcspark.errors import FgcError, sanitise_id

    p = Path(x)
    if p.exists():
        name = p.name
        for suf in (".zip", ".tsv"):
            name = name.removesuffix(suf)
        return str(p), name
    m = re.fullmatch(r"(?:https?://tun\.fi/)?(?:HBF\.)?(\d+)", x.strip())
    if not m:
        raise FgcError(f"File {x} not found", "fs_error")
    name = sanitise_id(m.group(1))["name"]  # digits route -> HBF.<id>
    if cache_dir is not None:
        cand = Path(cache_dir) / f"{name}.zip"
        if cand.exists():
            return str(cand), name
    raise FgcError(
        f"{name} not in local cache and network loading is unavailable",
        "fs_error",
    )


def route_members(names: list[str]) -> dict[str, str]:
    """Member-name routing: {role: member_name} for the recognised
    members of a citable archive. Missing roles are absent."""
    out: dict[str, str] = {}
    for n in names:
        base = n.rsplit("/", 1)[-1]
        for role, pat in _MEMBER_PATTERNS.items():
            if pat.match(base) and role not in out:
                out[role] = n
    return out


def translate_columns(cols: list[str], dwc: bool = True) -> list[str]:
    """Citable header -> finbif short name -> (optional) Darwin Core;
    unknown headers pass through name-sanitised (P2)."""
    short = [CITABLE_VARS.get(c, c) for c in cols]
    if dwc:
        short = [TO_DWC.get(c, c) for c in short]
    return sanitise_nms(short)


def _read_tsv(spark: SparkSession, path: str) -> DataFrame:
    # citable-archive member TSVs are unquoted tab-separated (verified
    # on the reference fixtures: zero structural quotes, zero column-
    # count mismatches with quoting off); "" disables quoting
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("quote", "")
        .csv(path)
    )


def _read_lite_tsv_file(spark: SparkSession, path: str) -> DataFrame:
    """Lite-download TSVs are NOT the citable member shape: free-text
    fields are double-quoted and may embed literal newlines
    (laji-data.tsv carries 32 multi-line records), and trailing empty
    fields are dropped on some rows (laji-data2.tsv: 55/54-field rows
    under a 59-column header). The reference loads these through R
    read.delim defaults (quote='\"', fill=TRUE), so the engine mirrors
    that: quote-aware multiLine parse, short rows null-padded by
    PERMISSIVE mode. multiLine makes one file one split — fine here:
    lite files are single user downloads; the citable/distributed path
    is the scale path."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("quote", '"')
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def drop_all_na_columns(
    df: DataFrame, candidates: list[str] | None = None
) -> DataFrame:
    """finbif's `drop_na` / `drop_facts_na` semantics (public
    `finbif_occurrence_load` options; the reference's API passes BOTH
    as FALSE per chunk, api.R:158-162, precisely so chunk schemas stay
    stable): remove the columns whose every value is NA, optionally
    restricted to `candidates`.

    Cost: ONE aggregate pass — per-column max(isNotNull), map-side
    combined booleans, |cols| bits of driver result — so the switch is
    a single extra scan regardless of table size."""
    cols = [c for c in (candidates if candidates is not None else df.columns)
            if c in df.columns]
    if not cols:
        return df
    flags = df.agg(
        *[F.max(F.col(c).isNotNull()).alias(f"_{i}") for i, c in enumerate(cols)]
    ).collect()[0]
    drop = [c for i, c in enumerate(cols) if not flags[f"_{i}"]]
    return df.drop(*drop) if drop else df


def read_citable_zip(
    spark: SparkSession,
    zip_path: str,
    facts: dict[str, list[str]] | None = None,
    dwc: bool = True,
    deselect: list[str] | None = None,
    extract_dir: str | None = None,
    drop_na: bool = False,
    drop_facts_na: bool | None = None,
) -> tuple[DataFrame, str | None]:
    """Load one citable archive -> (rows DataFrame, readme text).

    Mirrors the reference load path (R/finbif_geo_convert.R:78-94):
    column select (deselect list), fact pivot + join per level, name
    sanitisation, optional Darwin Core names. Fact columns keep their
    (sanitised) fact names, appearing after the row columns.

    `drop_na` / `drop_facts_na` twin finbif_occurrence_load's options
    (the chunked API replay passes both FALSE, api.R:158-162):
    drop_na=True removes every all-NA column; drop_facts_na (defaults
    to drop_na, as in finbif) restricts the check to the pivoted fact
    columns — a whitelisted fact absent from the archive pivots to an
    all-NA column, which this switch removes."""
    facts = FACTS if facts is None else facts
    deselect = DESELECT if deselect is None else deselect
    with zipfile.ZipFile(zip_path) as zf:
        members = route_members(zf.namelist())
        if "rows" not in members:
            raise FileNotFoundError(f"no rows_*.tsv member in {zip_path}")
        out_dir = Path(extract_dir or tempfile.mkdtemp(prefix="fgc_citable_"))
        extracted = {
            role: zf.extract(m, out_dir) for role, m in members.items() if role != "readme"
        }
        readme = (
            zf.read(members["readme"]).decode("utf-8", "replace")
            if "readme" in members
            else None
        )

    rows = _read_tsv(spark, extracted["rows"])
    translated = translate_columns(rows.columns, dwc=False)
    rows = rows.toDF(*translated)
    keep = [c for c in rows.columns if c not in deselect]
    rows = rows.select(*keep)

    fact_cols: list[str] = []
    for level, names in facts.items():
        member, key_short = _FACT_MEMBER[level]
        if member not in extracted or not names:
            continue
        fdf = _read_tsv(spark, extracted[member])
        key = sanitise_nms([key_short])[0]
        if key not in rows.columns:
            continue
        # record facts are row-scale: shuffle join; event/document fact
        # tables are orders smaller: broadcast. order_col=Value makes
        # the duplicate-fact pick deterministic (min) under any
        # partitioning — the reference's first() is file-order bound
        rows = join_facts(
            rows, fdf, names, key, order_col="Value", broadcast=(level != "record")
        )
        fact_cols.extend(names)
    if dwc:
        rows = rows.toDF(*translate_columns(rows.columns, dwc=True))
    else:
        rows = rows.toDF(*sanitise_nms(rows.columns))
    if drop_na:
        rows = drop_all_na_columns(rows)
    elif drop_facts_na:
        rows = drop_all_na_columns(rows, sanitise_nms(fact_cols))
    return rows, readme


def read_lite_tsv(
    spark: SparkSession,
    tsv_path: str,
    dwc: bool = True,
    deselect: list[str] | None = None,
    drop_na: bool = False,
) -> DataFrame:
    """Load a lite-download TSV (the reference's other accepted input,
    inst/tinytest/laji-data*.tsv — 58/59 translated-header columns, no
    fact members). Header translation via LITE_VARS, deselect and
    Darwin Core renames as for the citable shape; extra columns pass
    through name-sanitised, so both column counts load unchanged.
    drop_na twins finbif_occurrence_load's all-NA column removal."""
    deselect = DESELECT if deselect is None else deselect
    rows = _read_lite_tsv_file(spark, tsv_path)
    short = [LITE_VARS.get(c, c) for c in rows.columns]
    rows = rows.toDF(*sanitise_nms(short))
    rows = rows.select(*[c for c in rows.columns if c not in deselect])
    if dwc:
        rows = rows.toDF(*sanitise_nms([TO_DWC.get(c, c) for c in rows.columns]))
    if drop_na:
        rows = drop_all_na_columns(rows)
    return rows


def read_citable_zips_distributed(
    spark: SparkSession,
    zips_glob: str,
    columns: list[str],
    dwc: bool = True,
) -> DataFrame:
    """Many archives -> one DataFrame of the requested (translated)
    columns plus `archive`: binaryFile scan + in-executor unzip/parse.

    One task per archive, no driver-side I/O, no shuffle — the shape
    that ingests a lake of citable downloads at cluster scale. Fact
    enrichment is a per-archive follow-up join (facts parent ids never
    cross archives)."""
    import pandas as pd

    want = list(columns)
    out_fields = translate_columns(want, dwc) + ["archive"]
    schema = ", ".join(f"`{c}` string" for c in out_fields)

    def parse(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    members = route_members(zf.namelist())
                    if "rows" not in members:
                        continue
                    with zf.open(members["rows"]) as fh:
                        tdf = pd.read_csv(
                            fh, sep="\t", dtype=str, quoting=3, usecols=lambda c: c in want
                        )
                tdf = tdf.reindex(columns=want)
                tdf.columns = out_fields[:-1]
                tdf["archive"] = path.rsplit("/", 1)[-1]
                yield tdf

    return (
        spark.read.format("binaryFile")
        .load(zips_glob)
        .select("path", "content")
        .mapInPandas(parse, schema)
    )
