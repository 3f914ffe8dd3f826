"""fgcspark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of luomus/finbif-geo-convert (reference at
/root/reference, R package ``fgc``) as a distributed, Catalyst-friendly
Spark engine over Common-Crawl-style web-page tables:

- geometry pipeline (point / bbox / footprint x wgs84 / euref),
  semantics per reference R/finbif_geo_convert.R:24-630
- FinBIF 1/10/50/100 km grid tiling (ETRS-TM35FIN integer-km cells)
- point-in-polygon joins against broadcast STR-indexed polygon layers
- kNN joins via cell-ring expansion
- resumable chunked runs with per-partition lineage + metrics
  (reference chunk/resume model: api.R:144-199)

All geometry/CRS kernels are hand-written numpy over Arrow batches
(vectorized pandas UDFs) — no per-row Python in any hot path.
"""

__version__ = "0.1.0"
