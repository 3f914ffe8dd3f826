"""Deterministic synthetic occurrence tables (FIXTURES.md §2/§3).

Re-expresses the reference's citable-archive shape
(inst/tinytest/HBF.53254.zip: a rows TSV + three long facts TSVs with
schema Parent,Fact,Value,IntValue,DecimalValue) as parquet, with fact
names drawn from the reference pivot whitelist
(R/finbif_geo_convert.R:641-653) plus noise names the whitelist must
drop. Seed 42; sizes scale with the pages SCALE_ROWS."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fgcspark.synth.pages import DATA_DIR, SCALE_ROWS, SPECIES

# reference whitelist (R/finbif_geo_convert.R:641-653): 3 record +
# 3 event + 1 document facts, Finnish names
RECORD_FACTS = [
    "Havainnon laatu",
    "Havainnon maaran yksikko",
    "Museo, johon lajista keratty nayte on talletettu",
]
EVENT_FACTS = ["Vesistoalue", "Sijainnin tarkkuusluokka", "Pesintatulos"]
DOCUMENT_FACTS = ["Seurattava laji"]
WHITELIST = RECORD_FACTS + EVENT_FACTS + DOCUMENT_FACTS
NOISE_FACTS = ["Ei kiinnostava", "Roskaa", "Extra"]

MUNICIPALITIES = [f"kunta_{i:02d}" for i in range(20)]


def generate_occ(scale: str, out_dir: Path | None = None, force: bool = False) -> Path:
    n = max(SCALE_ROWS[scale] // 5, 400)  # occurrence rows per scale
    out = (out_dir or DATA_DIR) / scale
    rows_p = out / "occ_rows.parquet"
    facts_p = out / "occ_facts.parquet"
    if not force and rows_p.exists() and facts_p.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng([42, n, 99])

    i = np.arange(n)
    occ_id = [f"http://tun.fi/JX.{1373000 + k}#3" for k in i]
    rows = pa.table(
        {
            "occurrenceID": occ_id,
            "scientificName": [SPECIES[(k * 7) % 50] for k in i],
            "individualCount": pa.array(
                [None if k % 10 == 3 else 1 + (k % 7) for k in i], pa.int64()
            ),
            "eventDateTime": [f"2022-04-19 [15:{k % 60:02d}]" for k in i],
            "municipality": [MUNICIPALITIES[k % 20] for k in i],
            "coordinateUncertaintyInMeters": pa.array(
                [[1, 100, 1000][k % 3] for k in i], pa.int64()
            ),
        }
    )
    pq.write_table(rows, rows_p, row_group_size=max(2000, n // 16))

    # ~1.5 facts/row; every parent gets 0-3 facts, values deterministic;
    # ~25 % of fact rows use non-whitelisted (noise) names
    parents, names, values, ints, decs = [], [], [], [], []
    all_names = WHITELIST + NOISE_FACTS
    for k in i:
        for j in range(int(rng.integers(0, 4))):
            fact = all_names[int(rng.integers(0, len(all_names)))]
            parents.append(occ_id[k])
            names.append(fact)
            values.append(f"v{k % 13}_{j}")
            ints.append(int(k % 29))
            decs.append(round(float(k % 97) / 7.0, 6))
    facts = pa.table(
        {
            "Parent": parents,
            "Fact": names,
            "Value": values,
            "IntValue": pa.array(ints, pa.int64()),
            "DecimalValue": pa.array(decs, pa.float64()),
            # file row order: what the reference's first()-semantics see
            "ord": pa.array(list(range(len(parents))), pa.int64()),
        }
    )
    pq.write_table(facts, facts_p, row_group_size=max(2000, len(parents) // 16))
    return out


if __name__ == "__main__":
    import sys

    for sc in sys.argv[1:] or ["sf0.001", "sf0.01"]:
        print(generate_occ(sc, force="--force" in sys.argv))
