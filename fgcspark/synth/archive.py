"""Deterministic citable-archive (HBF-style zip) fixture.

Mirrors the member layout and TSV schemas of the reference's test
archives (inst/tinytest/HBF.53254.zip: `rows_HBF.<id>.tsv` with
dotted citable headers, `document/gathering/unit_facts_HBF.<id>.tsv`
with schema Parent/Fact/Value/IntValue/DecimalValue, and
`readme_HBF.<id>.txt`). Written BOTH as the zip (what the engine's
archive reader consumes) and as an extracted directory (what the
DuckDB oracle reads with its own TSV parser) so the two engines share
only the bytes on disk, not any parsing code.

Seed 42; row count scales with the pages SCALE_ROWS."""

from __future__ import annotations

import zipfile
from pathlib import Path

import numpy as np

from fgcspark.synth.pages import DATA_DIR, SCALE_ROWS, SPECIES

HBF_ID = 90001

# rows-TSV headers: the spatial/id/taxon columns the engine maps, the
# deselect-listed bbox variants (must vanish on load), plus an
# unmapped passthrough column
ROWS_HEADERS = [
    "Unit.UnitID",
    "Gathering.GatheringID",
    "Document.DocumentID",
    "Taxon.ScientificName",
    "Unit.Abundance",
    "Gathering.DisplayDateTime",
    "Gathering.Interpretations.Municipality",
    "Gathering.Conversions.WGS84CenterPoint.Lat(N)",
    "Gathering.Conversions.WGS84CenterPoint.Lon(E)",
    "Gathering.Conversions.WGS84_WKT",
    "Gathering.Conversions.WGS84.LatMin(N)",
    "Gathering.Conversions.WGS84.LatMax(N)",
    "Gathering.Conversions.WGS84.LonMin(E)",
    "Gathering.Conversions.WGS84.LonMax(E)",
    "Unit.Notes",
]

RECORD_FACTS = [
    "Havainnon laatu",
    "Havainnon määrän yksikkö",
    "Museo, johon lajista kerätty näyte on talletettu",
]
EVENT_FACTS = ["Vesistöalue", "Sijainnin tarkkuusluokka", "Pesintätulos"]
DOCUMENT_FACTS = ["Seurattava laji"]
NOISE_FACTS = ["Ei kiinnostava", "Roskaa"]

MUNICIPALITIES = [f"kunta_{i:02d}" for i in range(20)]


def _facts_tsv(rng, parents: list[str], names: list[str]) -> str:
    """Long facts member: 0-3 facts per parent, whitelisted + noise
    names, deterministic values."""
    lines = ["Parent\tFact\tValue\tIntValue\tDecimalValue"]
    pool = names + NOISE_FACTS
    for k, p in enumerate(parents):
        for j in range(int(rng.integers(0, 4))):
            fact = pool[int(rng.integers(0, len(pool)))]
            lines.append(
                f"{p}\t{fact}\tv{k % 13}_{j}\t{k % 29}\t{round(float(k % 97) / 7.0, 6)}"
            )
    return "\n".join(lines) + "\n"


def generate_archive(scale: str, out_dir: Path | None = None, force: bool = False) -> Path:
    n = max(SCALE_ROWS[scale] // 10, 300)
    out = (out_dir or DATA_DIR) / scale
    zip_path = out / f"HBF.{HBF_ID}.zip"
    ext_dir = out / "hbf_extracted"
    if not force and zip_path.exists() and (ext_dir / "_SUCCESS").exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    ext_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng([42, n, 77])

    k = np.arange(n)
    unit_ids = [f"http://tun.fi/JX.{1373000 + v}#3" for v in k]
    gath_ids = [f"http://tun.fi/JX.{1373000 + v}#2" for v in (k // 4)]
    doc_ids = [f"http://tun.fi/JX.{1373000 + v}" for v in (k // 20)]
    lat = np.round(60.0 + 8.0 * rng.random(n), 6)
    lon = np.round(21.0 + 9.0 * rng.random(n), 6)

    rows = ["\t".join(ROWS_HEADERS)]
    for v in k:
        if v % 7 == 0:  # no centre point: footprint only
            la = lo = ""
            wkt = f"POINT ({lon[v]} {lat[v]})"
        elif v % 7 == 1:  # bbox-ish polygon footprint
            la, lo = str(lat[v]), str(lon[v])
            wkt = (
                f"POLYGON (({lon[v]} {lat[v]}, {lon[v] + 0.01} {lat[v]}, "
                f"{lon[v] + 0.01} {lat[v] + 0.01}, {lon[v]} {lat[v] + 0.01}, "
                f"{lon[v]} {lat[v]}))"
            )
        else:
            la, lo = str(lat[v]), str(lon[v])
            wkt = ""
        rows.append(
            "\t".join(
                [
                    unit_ids[v],
                    gath_ids[v],
                    doc_ids[v],
                    SPECIES[(v * 7) % 50],
                    "" if v % 10 == 3 else str(1 + v % 7),
                    f"2021-06-{1 + v % 28:02d}",
                    MUNICIPALITIES[v % 20],
                    la,
                    lo,
                    wkt,
                    str(lat[v] - 0.01),
                    str(lat[v] + 0.01),
                    str(lon[v] - 0.01),
                    str(lon[v] + 0.01),
                    f"note {v % 5}",
                ]
            )
        )
    rows_tsv = "\n".join(rows) + "\n"

    unit_tsv = _facts_tsv(rng, unit_ids, RECORD_FACTS)
    gath_tsv = _facts_tsv(rng, sorted(set(gath_ids)), EVENT_FACTS)
    doc_tsv = _facts_tsv(rng, sorted(set(doc_ids)), DOCUMENT_FACTS)
    readme = (
        f"Tämän latauksen tietosivu ja viittausohjeet: http://tun.fi/HBF.{HBF_ID}\n\n"
        "Synthetic fixture (seed 42) in the citable-download layout.\n"
    )

    members = {
        f"rows_HBF.{HBF_ID}.tsv": rows_tsv,
        f"unit_facts_HBF.{HBF_ID}.tsv": unit_tsv,
        f"gathering_facts_HBF.{HBF_ID}.tsv": gath_tsv,
        f"document_facts_HBF.{HBF_ID}.tsv": doc_tsv,
        f"readme_HBF.{HBF_ID}.txt": readme,
    }
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, text in members.items():
            zf.writestr(name, text)
    for name, text in members.items():
        (ext_dir / name).write_text(text, encoding="utf-8")
    (ext_dir / "_SUCCESS").touch()
    return out


if __name__ == "__main__":
    import sys

    for sc in sys.argv[1:] or ["sf0.001", "sf0.01"]:
        print(generate_archive(sc, force="--force" in sys.argv))
