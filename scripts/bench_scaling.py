#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the `N -> 4N executors,
efficiency >= 0.8` criterion is evidenced by running the IDENTICAL
spatial-core job at local[8] and local[32] on the same input
(32-core/125 GB box) and reporting throughput at both plus
efficiency = (T_8 / T_32) / 4.

Each parallelism level runs in its OWN subprocess (fresh JVM — no
shared executor state), does one untimed warm-up pass, then takes the
best of `--trials` timed passes. The host is SHARED (external load
observed between 2 and 30): levels are interleaved over `--rounds`
rounds (min per level across rounds), and a pure-CPU busy-loop
calibration measures how much 4x-thread speedup the box can deliver
at measurement time — reported as `cpu_ceiling` next to the raw
efficiency so the number can be judged against what the hardware
offered.

Usage: python scripts/bench_scaling.py [--scale sf1] [--trials 2] [--rounds 2]
Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.5:
        x += 1
    return x


def cpu_ceiling(lo: int, hi: int) -> float:
    """Measured pure-CPU speedup of hi threads over lo threads, now."""
    rates = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            rates[n] = sum(p.map(_burn, range(n)))
    return rates[hi] / rates[lo]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from fgcspark.session import get_spark
import bench as B
spark = get_spark("scaling", cores={cores}, shuffle_partitions={cores})
sf_dir = "{sf_dir}"
import __spark_entry__ as E
d = E._geo_dir(sf_dir)
n = spark.read.parquet(f"{{d}}/pages.parquet").count()
B.spatial_core(spark, sf_dir)  # warm-up, untimed
best = None
for _ in range({trials}):
    t0 = time.time()
    B.spatial_core(spark, sf_dir)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cores": {cores}, "sec": round(best, 3), "n_pages": n}}))
"""


def run_level(cores: int, sf_dir: str, trials: int) -> dict:
    code = _CHILD.format(repo=REPO, cores=cores, sf_dir=sf_dir, trials=trials)
    env = dict(os.environ, FGC_MAX_PARTITION_BYTES="1m")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="sf1")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cores", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    sf_dir = f"/root/repo/data/{args.scale}"
    lo, hi = args.cores
    load0 = os.getloadavg()[0]
    ceiling = cpu_ceiling(lo, hi)
    best = {lo: None, hi: None}
    n_pages = None
    for _round in range(args.rounds):  # interleave levels vs drifting load
        for cores in (hi, lo):
            r = run_level(cores, sf_dir, args.trials)
            n_pages = r["n_pages"]
            best[cores] = r["sec"] if best[cores] is None else min(best[cores], r["sec"])
    ratio = best[lo] / best[hi]
    eff = ratio / (hi / lo)
    result = {
        "metric": "spatial-core scaling efficiency",
        "scale": args.scale,
        "n_pages": n_pages,
        f"sec_local[{lo}]": best[lo],
        f"sec_local[{hi}]": best[hi],
        f"docs_per_sec_local[{lo}]": round(n_pages / best[lo], 1),
        f"docs_per_sec_local[{hi}]": round(n_pages / best[hi], 1),
        "speedup": round(ratio, 3),
        "efficiency": round(eff, 3),
        "cpu_ceiling": round(ceiling, 3),
        "ceiling_relative_efficiency": round(ratio / ceiling, 3),
        "loadavg_at_start": round(load0, 1),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = bench_dir / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    section = f"""
## Scaling run {stamp} — {args.scale} ({n_pages:,} pages)

Identical spatial-core job (extract -> point -> EPSG:3067 -> 10 km tiles
-> broadcast PIP join -> tile counts), fresh JVM per level, warm-up pass
untimed, levels interleaved over {args.rounds} rounds, best of
{args.trials} trials per round. Host is shared: 1-min loadavg at start
{load0:.1f}; pure-CPU busy-loop ceiling measured {ceiling:.2f}x
(the {hi // lo}x-thread speedup the box could deliver at that moment).

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{lo}]  (N)  | {best[lo]} | {n_pages/best[lo]:,.0f} |
| local[{hi}] (4N) | {best[hi]} | {n_pages/best[hi]:,.0f} |

speedup {lo}->{hi} cores: **{ratio:.2f}x**; scaling efficiency
(T_{lo}/T_{hi})/{hi//lo} = **{eff:.3f}** (target >= 0.8:
{"PASS" if eff >= 0.8 else "FAIL"}); ceiling-relative
{ratio:.2f}/{ceiling:.2f} = **{ratio/ceiling:.3f}**.
"""
    if md.exists():
        md.write_text(md.read_text() + section)
    else:
        md.write_text(
            "# BENCH/BASELINE — measured engine numbers\n\n"
            "Scaling criterion per BASELINE.json: >=0.8 efficiency from N to\n"
            "4N executors. No real cluster in this sandbox -> evidenced at two\n"
            "local parallelism levels on the same input (SURVEY.md §6).\n"
            + section
        )


if __name__ == "__main__":
    main()
