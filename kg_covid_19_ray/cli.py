"""Command-line entry points — the ``run.py`` analog (reference
run.py:13-198 click group with download/transform/merge/query/
holdouts). Subcommands:

- ``transform``: run registered transform plugins over an input
  (pages parquet dir or testdata sf dir) into per-source Parquet
  (+ optional KGX TSV);
- ``merge``: merge per-source outputs into one canonical node/edge
  pair, with optional stats JSON, TSV and N-Triples destinations;
- ``query``: run any registered engine query by name (the relational
  capability standing in for the reference's SPARQL ``query``
  command, run.py:97-127 / SURVEY S10);
- ``holdouts``: train/test split + negative edges (run.py:130-198).

The CLI owns its Ray session (guarded init — the driver contract
forbids library code from calling ray.init)."""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False


def _is_warc_dir(path: str) -> bool:
    import glob
    return os.path.isdir(path) and bool(
        glob.glob(os.path.join(path, "*.warc"))
        + glob.glob(os.path.join(path, "*.warc.gz")))


def cmd_transform(args: argparse.Namespace) -> int:
    _ensure_ray()
    if _is_warc_dir(args.input):
        # crawl-dump ingestion: a directory of .warc[.gz] archives
        # feeds the same extract -> detect -> dedup chain as Parquet
        # pages (sources/warc; byte-faithful per the shared oracle).
        # --checkpoint-dir is honored here too (round-4 ADVICE: this
        # branch used to return before the checkpoint handling, so the
        # flag was silently ignored and the run non-resumable); the
        # WARC dir path is the fingerprint key.
        from kg_covid_19_ray.pipelines.flagship import build_kg
        from kg_covid_19_ray.sources.warc import read_warc
        if args.checkpoint_dir:
            nodes, edges = build_kg(
                read_warc(args.input), share="checkpoint",
                checkpoint_dir=args.checkpoint_dir,
                source_key=args.input)
        else:
            nodes, edges = build_kg(read_warc(args.input))
        base = os.path.join(args.output_dir, "web_pages")
        nodes.write_parquet(os.path.join(base, "nodes"))
        edges.write_parquet(os.path.join(base, "edges"))
        out = {"web_pages": {
            "nodes": os.path.join(base, "nodes"),
            "edges": os.path.join(base, "edges"),
            "input_format": "warc"}}
        if args.checkpoint_dir:
            out["web_pages"]["checkpoint_dir"] = args.checkpoint_dir
        print(json.dumps(out, indent=2))
        return 0
    if args.checkpoint_dir:
        # resumable flagship path: extraction goes through the
        # per-stage checkpoint (state/checkpoint.run_stage); a rerun
        # with the same input skips completed stages
        from kg_covid_19_ray.pipelines.flagship import build_kg
        nodes, edges = build_kg(args.input, share="checkpoint",
                                checkpoint_dir=args.checkpoint_dir)
        base = os.path.join(args.output_dir, "web_pages")
        nodes.write_parquet(os.path.join(base, "nodes"))
        edges.write_parquet(os.path.join(base, "edges"))
        print(json.dumps({"web_pages": {
            "nodes": os.path.join(base, "nodes"),
            "edges": os.path.join(base, "edges"),
            "checkpoint_dir": args.checkpoint_dir}}, indent=2))
        return 0
    from kg_covid_19_ray.pipelines.registry import run_transforms
    out = run_transforms(args.input, args.output_dir,
                         sources=args.sources, tsv=args.tsv)
    print(json.dumps(out, indent=2))
    return 0


def cmd_merge(args: argparse.Namespace) -> int:
    _ensure_ray()
    import ray.data
    from kg_covid_19_ray.pipelines.merge_kg import (
        MergeConfig, SourceSpec, graph_stats, merge)

    specs = []
    for src in args.sources:
        name = os.path.basename(src.rstrip("/"))
        specs.append(SourceSpec(
            name=name,
            nodes=ray.data.read_parquet(os.path.join(src, "nodes")),
            edges=ray.data.read_parquet(os.path.join(src, "edges")),
        ))
    prop_types = dict(pt.split("=", 1) for pt in args.property_type)
    nodes, edges = merge(MergeConfig(sources=specs,
                                     property_types=prop_types))
    os.makedirs(args.output_dir, exist_ok=True)
    nodes.write_parquet(os.path.join(args.output_dir, "merged_nodes"))
    edges.write_parquet(os.path.join(args.output_dir, "merged_edges"))
    if args.stats:
        stats = graph_stats(
            ray.data.read_parquet(os.path.join(args.output_dir,
                                               "merged_nodes")),
            ray.data.read_parquet(os.path.join(args.output_dir,
                                               "merged_edges")))
        with open(os.path.join(args.output_dir, "merged_stats.json"),
                  "w") as fh:
            json.dump(stats, fh, indent=2)
        print(json.dumps(stats))
    if args.tsv:
        from kg_covid_19_ray.io.kgx import write_kgx_tsv
        write_kgx_tsv(
            ray.data.read_parquet(os.path.join(args.output_dir,
                                               "merged_nodes")),
            os.path.join(args.output_dir, "merged_nodes_tsv"))
        write_kgx_tsv(
            ray.data.read_parquet(os.path.join(args.output_dir,
                                               "merged_edges")),
            os.path.join(args.output_dir, "merged_edges_tsv"))
    if args.nt:
        from kg_covid_19_ray.io.kgx import write_ntriples
        write_ntriples(
            ray.data.read_parquet(os.path.join(args.output_dir,
                                               "merged_edges")),
            os.path.join(args.output_dir, "merged_edges_nt"))
    if args.tar:
        from kg_covid_19_ray.io.kgx import write_merged_tar
        write_merged_tar(
            ray.data.read_parquet(os.path.join(args.output_dir,
                                               "merged_nodes")),
            ray.data.read_parquet(os.path.join(args.output_dir,
                                               "merged_edges")),
            os.path.join(args.output_dir, "merged-kg.tar.gz"))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    _ensure_ray()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry
    qs = entry.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; available: "
              f"{', '.join(sorted(qs))}", file=sys.stderr)
        return 2
    result = qs[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:
        df = result
    if args.output:
        df.to_csv(args.output, sep="\t", index=False)
    else:
        print(df.to_csv(sep="\t", index=False), end="")
    return 0


def cmd_holdouts(args: argparse.Namespace) -> int:
    _ensure_ray()
    from kg_covid_19_ray.pipelines import holdouts as h
    os.makedirs(args.output_dir, exist_ok=True)
    split = h.holdout_connected if args.connected else h.holdout_split
    split(args.sf_dir).write_parquet(
        os.path.join(args.output_dir, "edges_split"))
    h.holdout_negatives(args.sf_dir).write_parquet(
        os.path.join(args.output_dir, "edges_negative"))
    print(json.dumps({"output_dir": args.output_dir,
                      "connected": bool(args.connected)}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="kg-ray")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("transform", help="run transform plugins")
    t.add_argument("--input", required=True)
    t.add_argument("--output-dir", required=True)
    t.add_argument("--sources", nargs="*", default=["web_pages"],
                   help="registered transform plugins to run "
                        "(default: the flagship web_pages)")
    t.add_argument("--tsv", action="store_true")
    t.add_argument("--checkpoint-dir", default=None,
                   help="resumable run: per-stage parquet checkpoints")
    t.set_defaults(fn=cmd_transform)

    m = sub.add_parser("merge", help="merge per-source outputs")
    m.add_argument("--sources", nargs="+", required=True,
                   help="per-source dirs written by transform")
    m.add_argument("--output-dir", required=True)
    m.add_argument("--stats", action="store_true")
    m.add_argument("--tsv", action="store_true")
    m.add_argument("--nt", action="store_true")
    m.add_argument("--tar", action="store_true",
                   help="package merged TSVs as merged-kg.tar.gz "
                        "(reference merge.yaml destination layout)")
    m.add_argument("--property-type", action="append", default=[],
                   metavar="COLUMN=XSDTYPE",
                   help="declare a typed property column surviving the "
                        "all-strings union, e.g. combined_score=xsd:float "
                        "(reference merge.yaml property_types); repeatable")
    m.set_defaults(fn=cmd_merge)

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--output", default=None)
    q.set_defaults(fn=cmd_query)

    h = sub.add_parser("holdouts", help="edge split + negatives")
    h.add_argument("--connected", action="store_true",
                   help="connectivity-preserving split: a spanning "
                        "forest stays in train (ensmallen "
                        "random_holdout analog)")
    h.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    h.add_argument("--output-dir", required=True)
    h.set_defaults(fn=cmd_holdouts)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray
        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
