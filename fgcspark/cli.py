"""spark-submit entry point.

Deploy story per BASELINE.json: `spark-submit --py-files fgcspark.zip
fgcspark/cli.py <job> ...` on a multi-executor cluster; locally the
same commands run on local[N]. The reference's HTTP API surface
(GET /{input}/{fmt}/{geo}/{crs} + /status + /output, api.R:75-412)
maps onto: `convert` = the conversion pipeline, `status` = the chunk
manifest (progress deciles + per-chunk lineage/metrics), resumable
re-invocation = just running `convert --resume` again.

Examples:
  python -m fgcspark.cli convert --input data/sf0.001 --output /tmp/out \
      --geo footprint --crs euref --format geojson
  python -m fgcspark.cli tiles --input data/sf0.001 --size-km 10
  python -m fgcspark.cli pip --input data/sf0.001
  python -m fgcspark.cli convert --input data/sf0.001 --output /tmp/out --resume
  python -m fgcspark.cli status --output /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from fgcspark.session import get_spark

    return get_spark("fgcspark-cli", cores=args.cores)


def cmd_convert(args) -> int:
    from fgcspark.checkpoint import ChunkedRunner
    from fgcspark.pipeline import geo_pipeline, write_layered
    from fgcspark.sinks import write_geojson_layers

    spark = _spark(args)
    if args.resume:
        runner = ChunkedRunner(spark, args.output, n_chunks=args.chunks)
        summary = runner.run(
            lambda s: geo_pipeline(s, args.input, geo=args.geo, crs=args.crs)
        )
        print(json.dumps(summary))
        return 0
    df = geo_pipeline(spark, args.input, geo=args.geo, crs=args.crs)
    if args.format == "geojson":
        paths = write_geojson_layers(df, args.output, args.basename)
        print(json.dumps({"layers": paths}))
    elif args.format == "gpkg":
        # the reference's native output (S3 gate allows gpkg|none,
        # R/finbif_geo_convert.R:60-73): one file, layer per type
        from fgcspark.sinks import write_gpkg

        gpkg = f"{args.output.rstrip('/')}/{args.basename}_geo.gpkg"
        layers = write_gpkg(df, gpkg, args.basename)
        print(json.dumps({"output": gpkg, "layers": layers}))
    elif args.format == "geoparquet":
        # data-scale geo output: distributed, self-describing WKB files
        from fgcspark.geoparquet import write_geoparquet

        crs_epsg = 3067 if args.crs == "euref" else 4326
        summary = write_geoparquet(
            df.select("url", "geo_wkt"), args.output, crs_epsg=crs_epsg
        )
        print(json.dumps({k: summary[k] for k in ("n_rows", "n_files", "bbox")}))
    else:
        write_layered(df, args.output)
        print(json.dumps({"output": args.output, "format": "parquet"}))
    return 0


def cmd_convert_occ(args) -> int:
    """The reference's end-to-end flow on its native input (S1->S7):
    citable zip -> facts/DwC load -> geometry -> layered sink -> readme
    extraction + output zip bundle (api.R:228-264)."""
    from pathlib import Path

    from fgcspark.io.archive import resolve_input
    from fgcspark.packaging import extract_readme, package_outputs
    from fgcspark.pipeline import convert_occurrences, write_layered
    from fgcspark.sinks import write_geojson_layers, write_gpkg

    spark = _spark(args)
    in_path, name = resolve_input(args.input, cache_dir=args.cache_dir)
    basename = args.basename or name
    df, _readme, _name = convert_occurrences(
        spark,
        args.input,
        geo=args.geo,
        crs=args.crs,
        dwc=not args.no_dwc,
        cache_dir=args.cache_dir,
    )
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    if args.format == "gpkg":
        gpkg = out / f"{basename}_geo.gpkg"
        layers = write_gpkg(df, str(gpkg), basename)
    elif args.format == "geojson":
        layers = write_geojson_layers(df, str(out), basename)
    else:
        write_layered(df, str(out / "layers"))
        layers = {"parquet": str(out / "layers")}
    if in_path.endswith(".zip"):
        extract_readme(in_path, out)
    bundle = package_outputs(out, basename, args.format)
    print(json.dumps({"layers": layers, "bundle": str(bundle)}))
    return 0


def cmd_tiles(args) -> int:
    from fgcspark.pipeline import tile_counts

    spark = _spark(args)
    df = tile_counts(spark, args.input, size_km=args.size_km)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output}))
    else:
        for r in df.orderBy("cell").limit(args.limit).collect():
            print(f"{r['cell']}\t{r['n_docs']}")
    return 0


def cmd_pip(args) -> int:
    from fgcspark.joins.pip import pip_join
    from fgcspark.pipeline import pages_to_points

    spark = _spark(args)
    pts = pages_to_points(spark, args.input).select("url", "e", "n")
    polys = spark.read.parquet(args.polygons or f"{args.input}/polygons.parquet")
    df = pip_join(spark, pts, polys)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output}))
    else:
        print(json.dumps({"matches": df.count()}))
    return 0


def cmd_knn(args) -> int:
    from fgcspark.joins.knn import knn_join
    from fgcspark.pipeline import pages_to_points

    spark = _spark(args)
    pts = pages_to_points(spark, args.input).select("url", "e", "n")
    probes = spark.read.parquet(args.probes or f"{args.input}/probes.parquet")
    df = knn_join(spark, pts, probes, k=args.k)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output}))
    else:
        print(json.dumps({"rows": df.count()}))
    return 0


def cmd_status(args) -> int:
    """Reference /status/{id} twin (api.R:288-386): with --dir, the
    full HTTP response envelope (404/400/303/200-pending + timeout
    clamp) over a conversion work dir — no Spark session needed; with
    --output, chunk-manifest progress + lineage."""
    if args.dir:
        from fgcspark.packaging import poll_status

        print(json.dumps(poll_status(args.dir, timeout=args.timeout)))
        return 0
    from fgcspark.checkpoint import ChunkedRunner

    spark = _spark(args)
    runner = ChunkedRunner(spark, args.output, n_chunks=args.chunks)
    print(
        json.dumps(
            {
                "progress_percent": runner.progress_percent(),
                "chunks": runner.metrics(),
            }
        )
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fgcspark")
    p.add_argument("--cores", type=int, default=None, help="local[N]; omit on a cluster")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="geo conversion pipeline (point|bbox|footprint)")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--geo", default="point", choices=["point", "bbox", "footprint"])
    c.add_argument("--crs", default="wgs84", choices=["wgs84", "euref"])
    c.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "geojson", "gpkg", "geoparquet"],
    )
    c.add_argument("--basename", default="fgc_geo")
    c.add_argument("--resume", action="store_true", help="chunked resumable run")
    c.add_argument("--chunks", type=int, default=16)
    c.set_defaults(fn=cmd_convert)

    o = sub.add_parser(
        "convert-occ",
        help="convert a citable-download zip (the reference's native input)",
    )
    o.add_argument(
        "--input",
        required=True,
        help="citable zip path, lite TSV path, or dataset id "
        "(645 / HBF.645 / https://tun.fi/HBF.645, resolved via --cache-dir)",
    )
    o.add_argument("--output", required=True)
    o.add_argument(
        "--cache-dir",
        default=None,
        help="local download cache holding HBF.<id>.zip archives "
        "(the no-network twin of finbif's cache path)",
    )
    o.add_argument("--geo", default="point", choices=["point", "bbox", "footprint"])
    o.add_argument("--crs", default="wgs84", choices=["wgs84", "euref"])
    o.add_argument("--format", default="gpkg", choices=["parquet", "geojson", "gpkg"])
    o.add_argument("--basename", default=None, help="defaults to the dataset name")
    o.add_argument("--no-dwc", action="store_true")
    o.set_defaults(fn=cmd_convert_occ)

    t = sub.add_parser("tiles", help="docs per FinBIF grid tile")
    t.add_argument("--input", required=True)
    t.add_argument("--output")
    t.add_argument("--size-km", type=int, default=10, choices=[1, 10, 50, 100])
    t.add_argument("--limit", type=int, default=20)
    t.set_defaults(fn=cmd_tiles)

    j = sub.add_parser("pip", help="point-in-polygon join")
    j.add_argument("--input", required=True)
    j.add_argument("--polygons")
    j.add_argument("--output")
    j.set_defaults(fn=cmd_pip)

    k = sub.add_parser("knn", help="k nearest pages per probe")
    k.add_argument("--input", required=True)
    k.add_argument("--probes")
    k.add_argument("--output")
    k.add_argument("-k", type=int, default=5)
    k.set_defaults(fn=cmd_knn)

    s = sub.add_parser(
        "status", help="conversion status envelope / chunked-run progress"
    )
    s.add_argument("--output", default=None, help="chunk-manifest dir (Spark mode)")
    s.add_argument(
        "--dir", default=None, help="conversion work dir (HTTP-envelope mode)"
    )
    s.add_argument(
        "--timeout", type=float, default=30.0, help="poll timeout s (clamped to 60)"
    )
    s.add_argument("--chunks", type=int, default=16)
    s.set_defaults(fn=cmd_status)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
