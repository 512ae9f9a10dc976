"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1), one JSON line on stdout.

Usage:
    python bench.py                 # full bench at $RAY_GRAFT_CPUS (def 32)
    python bench.py --scaling      # same headline job at 8 and 32 CPUs in
                                   # fresh processes; reports throughputs +
                                   # scaling efficiency (BASELINE.md protocol)

The headline is the flagship KG build: read pages parquet -> extract ->
mention-detect -> link -> canonicalize -> dedup -> node/edge tables.
Pages are synthesized once (untimed, cached under /tmp) so the timed
job starts from an on-disk crawl-style parquet table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _replicas() -> int:
    # Deterministic corpus scaling for the bench fixture: the driver
    # documents table is small (5k rows at sf0.1); replication gives the
    # headline job enough work to be compute-bound rather than
    # overhead-bound, which is what the 8-vs-32-CPU scaling protocol
    # needs to measure anything real.
    return int(os.environ.get("GRAFT_BENCH_REPLICAS", "2000"))


def _pages_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/kg_ray_bench/pages_{tag}_x{_replicas()}"


def run_bench(sf_dir: str, num_cpus: int, only: str | None = None) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from kg_covid_19_ray.sources.pages import write_pages_parquet

    pages_dir = _pages_dir(sf_dir)
    os.makedirs(os.path.dirname(pages_dir), exist_ok=True)
    write_pages_parquet(sf_dir, pages_dir, replicas=_replicas())  # untimed

    from kg_covid_19_ray.pipelines.flagship import (
        build_kg, canonical_mentions, extracted_docs, mention_edges,
        pages_dataset)

    # untimed warmup: prime OS page cache, spawn worker processes and the
    # detector actor pool, so the timed runs measure compute + shuffle
    n_pages = ray.data.read_parquet(pages_dir).count()
    mention_edges(canonical_mentions(extracted_docs(
        pages_dataset(pages_dir).limit(4096)))).count()

    timings: dict[str, float] = {}
    extras: dict = {}

    # Shared-host variance swings single runs by tens of percent
    # (round-2 BENCH recorded dedup_exact at 4.2s vs 1.5s on a clean
    # run). Short queries and the headline are timed best-of-N
    # (min), which is the cheapest stable estimator; the long big-doc
    # suite stays single-run to bound bench wall-clock.
    reps_default = int(os.environ.get("BENCH_REPS", "2"))

    def timed(name: str, fn, reps: int | None = None):
        if only and name != only:
            return
        best = None
        for _ in range(reps_default if reps is None else reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
        timings[name] = round(best, 3)
        return out

    def kg_triples():
        # headline: one fully-streaming job, pages parquet -> deduped
        # triple rows (no barrier, no materialization)
        edges = mention_edges(canonical_mentions(pages_dir))
        if os.environ.get("BENCH_STATS"):
            # per-stage execution stats (wall, cpu, rows, object-store
            # bytes per operator) for tuning evidence; materialize so
            # the stats survive consumption (adds store overhead -
            # don't compare this run's wall-clock with the default)
            edges = edges.materialize()
            n_edges = edges.count()
            stats_path = os.environ.get(
                "BENCH_STATS_PATH", "/tmp/kg_ray_bench/headline_stats.txt")
            with open(stats_path, "w") as fh:
                fh.write(edges.stats())
            extras["stats_path"] = stats_path
        else:
            n_edges = edges.count()
        extras["triples_out"] = n_edges
        return n_edges

    def kg_build():
        # both outputs (nodes + edges) in one session. Extracted docs
        # are pinned (both branches read them); the mention chain is
        # RECOMPUTED per branch — measured faster than materializing
        # 72M mention rows (object-store round trip breaks operator
        # fusion: 41s pinned vs 28.6s recomputed at sf0.1/32cpu)
        nodes, edges = build_kg(pages_dir, materialize_mentions=False,
                                share="materialize")
        extras["triples_out"] = edges.count()
        extras["nodes_out"] = nodes.count()

    timed("kg_triples", kg_triples)
    timed("kg_build", kg_build, reps=1)

    # >10M-page regime (round-4 VERDICT item 7): the round-4 extra-scale
    # capture saw 2x data -> 3.1x wall when the 145M-triple output was
    # MATERIALIZED (count() holds every block in the object store while
    # upstream still streams). These two entries run the same chain into
    # a streaming write_parquet sink — blocks leave the store as soon as
    # they're written — at 10M and 20M pages, so the ratio isolates the
    # pipeline's scaling from output-materialization pressure. Output
    # row counts come from the written footers (metadata-only).
    def _kg_triples_sink(src_dir: str, out_dir: str) -> int:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        mention_edges(canonical_mentions(src_dir)).write_parquet(out_dir)
        import glob

        import pyarrow.parquet as pq
        return sum(pq.ParquetFile(p).metadata.num_rows
                   for p in glob.glob(f"{out_dir}/*.parquet"))

    sink10 = "/tmp/kg_ray_bench/triples_sink_10m"
    sink20 = "/tmp/kg_ray_bench/triples_sink_20m"
    tag = os.path.basename(os.path.normpath(sf_dir))
    pages20_dir = f"/tmp/kg_ray_bench/pages_{tag}_x{2 * _replicas()}"

    def kg_triples_10m_sink():
        extras["triples_10m_sink_out"] = _kg_triples_sink(pages_dir, sink10)

    def kg_triples_20m_sink():
        extras["triples_20m_sink_out"] = _kg_triples_sink(pages20_dir,
                                                          sink20)

    timed("kg_triples_10m_sink", kg_triples_10m_sink, reps=1)
    if only is None or only == "kg_triples_20m_sink":
        write_pages_parquet(sf_dir, pages20_dir,
                            replicas=2 * _replicas())  # untimed fixture
    timed("kg_triples_20m_sink", kg_triples_20m_sink, reps=1)
    import shutil
    shutil.rmtree(sink10, ignore_errors=True)  # keep /tmp bounded
    shutil.rmtree(sink20, ignore_errors=True)
    if ("kg_triples_10m_sink" in timings
            and "kg_triples_20m_sink" in timings):
        extras["sink_20m_over_10m"] = round(
            timings["kg_triples_20m_sink"]
            / max(timings["kg_triples_10m_sink"], 1e-9), 3)

    optional = []
    try:
        from kg_covid_19_ray.pipelines.relational import (
            events_hourly, pricing_summary)
        optional += [
            ("rel_pricing_summary", lambda: pricing_summary(sf_dir).count()),
            ("rel_events_hourly", lambda: events_hourly(sf_dir).count()),
        ]
    except ImportError:
        pass
    try:
        from kg_covid_19_ray.pipelines.textops import text_stats
        optional.append(("text_stats", lambda: text_stats(sf_dir).count()))
    except ImportError:
        pass
    try:
        from kg_covid_19_ray.pipelines.dedup_ops import minhash_near_dups
        optional.append(
            ("dedup_minhash", lambda: minhash_near_dups(sf_dir).count()))
    except ImportError:
        pass
    try:
        from kg_covid_19_ray.pipelines.similarity import ann_bruteforce
        optional.append(("sim_ann", lambda: ann_bruteforce(sf_dir).count()))
    except ImportError:
        pass
    try:
        from kg_covid_19_ray.pipelines.dedup_ops import exact_dedup
        optional.append(
            ("dedup_exact", lambda: exact_dedup(sf_dir).count()))
    except ImportError:
        pass
    try:
        from kg_covid_19_ray.pipelines.windowed import (
            sessions, sliding_count)
        optional += [
            ("rel_sessions", lambda: sessions(sf_dir).count()),
            ("rel_sliding_count", lambda: sliding_count(sf_dir).count()),
        ]
    except ImportError:
        pass

    for name, fn in optional:
        timed(name, fn)

    # detector at realistic dictionary scale: 10k synthetic surfaces +
    # the real gazetteer over the same pages. Token-hash path cost is
    # O(tokens), independent of |gazetteer| — this entry is the
    # per-round evidence (compare with kg_triples' detect share).
    def kg_detect_10k():
        from kg_covid_19_ray.pipelines.flagship import extracted_docs
        from kg_covid_19_ray.sources.gazetteer import GAZETTEER
        from kg_covid_19_ray.stages.mentions import MentionDetector
        entries = [(f"synterm{i:05d}", f"SYN:{i}", "synthetic", "biolink:NamedThing")
                   for i in range(10_000)] + list(GAZETTEER)
        docs = extracted_docs(pages_dir).select_columns(["doc_id", "text"])
        return docs.map_batches(
            MentionDetector, batch_format="pyarrow", batch_size=2048,
            concurrency=(2, max(2, num_cpus // 2)), num_cpus=1,
            fn_constructor_args=(entries,)).count()

    timed("kg_detect_10k", kg_detect_10k, reps=1)

    # pair explosion at corpus scale: co-occurrence over the replicated
    # pages' canonical mentions (round-4: vectorized repeat/cumsum pair
    # construction + bucketed C-level reduce — VERDICT item 6 evidence)
    def cooccur_big():
        from kg_covid_19_ray.pipelines.kg_queries import _cooccur_counts
        return _cooccur_counts(
            canonical_mentions(pages_dir)
            .select_columns(["doc_id", "curie"])).count()

    timed("cooccur_big", cooccur_big, reps=1)

    # crawl-dump ingestion at scale (round-4, VERDICT item 8): the
    # DISTRIBUTED WARC writer (one .warc.gz per write task,
    # sources/warc.write_warc_dataset) serializes a 1M-page corpus,
    # then the strict parser feeds the shared flagship chain. The dump
    # is rewritten every run so the write timing is reproducible and
    # disk stays bounded.
    warc_pages = int(os.environ.get("GRAFT_WARC_PAGES", "1000000"))
    if warc_pages > 0 and (only is None
                           or only in ("warc_write_big",
                                       "warc_ingest_big")):
        from kg_covid_19_ray.sources.warc import (read_warc,
                                                  write_warc_dataset)
        from kg_covid_19_ray.stages.extract import extract_text
        warc_dir = ("/tmp/kg_ray_bench/warc_"
                    f"{os.path.basename(os.path.normpath(sf_dir))}"
                    f"_{warc_pages}")

        # the ingest fallback is gated on this marker, not bare dir
        # existence (round-4 ADVICE: a partially written dump from an
        # interrupted prior run would be silently ingested)
        warc_ok = os.path.join(warc_dir, "_SUCCESS")

        def warc_write_big():
            import shutil
            shutil.rmtree(warc_dir, ignore_errors=True)
            write_warc_dataset(
                pages_dataset(pages_dir).limit(warc_pages),
                warc_dir, num_files=2 * num_cpus)
            with open(warc_ok, "w"):
                pass
            return warc_pages

        timed("warc_write_big", warc_write_big, reps=1)
        if not os.path.exists(warc_ok):  # write skipped by BENCH_ONLY
            warc_write_big()

        def warc_ingest_big():
            return mention_edges(canonical_mentions(
                extract_text(read_warc(warc_dir)))).count()

        timed("warc_ingest_big", warc_ingest_big, reps=1)

    # incremental build at crawl scale (round-4, VERDICT item 10): a
    # 1M-page corpus as 4 per-crawl dumps. incr_hist3_big = cold build
    # of 3 dumps (checkpoint root wiped); incr_append_big = the 4th
    # dump arriving. Append ≈ hist3/3 is the shard-cost-∝-shard-size
    # evidence: each shard reads ONLY its own dir.
    incr_replicas = int(os.environ.get("GRAFT_INCR_REPLICAS", "200"))
    if incr_replicas > 0 and (only is None
                              or only in ("incr_hist3_big",
                                          "incr_append_big")):
        import shutil
        from kg_covid_19_ray.pipelines.incremental import (
            build_kg_incremental, split_pages_to_crawl_dirs)
        tagb = os.path.basename(os.path.normpath(sf_dir))
        pages_1m = f"/tmp/kg_ray_bench/pages_{tagb}_x{incr_replicas}"
        write_pages_parquet(sf_dir, pages_1m, replicas=incr_replicas)
        crawls = split_pages_to_crawl_dirs(
            pages_1m,
            f"/tmp/kg_ray_bench/crawls_{tagb}_x{incr_replicas}",
            num_crawls=4)
        ckpt = f"/tmp/kg_ray_bench/incr_ckpt_{tagb}_x{incr_replicas}"
        shutil.rmtree(ckpt, ignore_errors=True)

        def incr_hist3_big():
            n, e = build_kg_incremental(crawls[:3], checkpoint_root=ckpt)
            return e.count()

        timed("incr_hist3_big", incr_hist3_big, reps=1)
        if not os.path.isdir(ckpt):  # hist skipped by BENCH_ONLY
            incr_hist3_big()

        def incr_append_big():
            n, e = build_kg_incremental(crawls, checkpoint_root=ckpt)
            return e.count()

        timed("incr_append_big", incr_append_big, reps=1)

    # windowed ops at 10^7 events (round-4 VERDICT item 1 evidence):
    # the derived bucket count (windowed._derive_buckets) must hold at
    # a scale where the old fixed 64 buckets would have put corpus/64
    # raw event rows into a single pandas kernel task.
    ev_replicas = int(os.environ.get("GRAFT_EVENT_REPLICAS", "100"))
    if ev_replicas > 0 and (only is None or only.startswith("events_")):
        from kg_covid_19_ray.pipelines.windowed import (asof_error_click,
                                                        sessions,
                                                        sliding_count)
        from kg_covid_19_ray.sources.eventgen import write_events_parquet
        tag = os.path.basename(os.path.normpath(sf_dir))
        ev_root = f"/tmp/kg_ray_bench/events_{tag}_x{ev_replicas}"
        if not os.path.isdir(f"{ev_root}/events.parquet"):
            write_events_parquet(sf_dir, ev_root, replicas=ev_replicas)
        extras["events_big"] = ray.data.read_parquet(
            f"{ev_root}/events.parquet").count()
        timed("events_sessions_big",
              lambda: sessions(ev_root).count(), reps=1)
        timed("events_sliding_big",
              lambda: sliding_count(ev_root).count(), reps=1)
        timed("events_asof_big",
              lambda: asof_error_click(ev_root).count(), reps=1)

    # ANN at 10^6 vectors: planted-cluster embeddings (sources/embedgen,
    # cached) through the IVF probe path and the cell-shuffle join path.
    emb_replicas = int(os.environ.get("GRAFT_EMB_REPLICAS", "2000"))
    if emb_replicas > 0 and (only is None or only.startswith("ann_")):
        try:
            from kg_covid_19_ray.sources.embedgen import \
                write_embeddings_parquet
            from kg_covid_19_ray.pipelines.similarity import (ann_ivf,
                                                              ann_ivf_join)
            tag = os.path.basename(os.path.normpath(sf_dir))
            emb_root = f"/tmp/kg_ray_bench/emb_{tag}_x{emb_replicas}"
            if not os.path.isdir(f"{emb_root}/embeddings.parquet"):
                write_embeddings_parquet(sf_dir, emb_root,
                                         replicas=emb_replicas)
            extras["vecs_big"] = ray.data.read_parquet(
                f"{emb_root}/embeddings.parquet").count()
            timed("ann_ivf_big", lambda: ann_ivf(emb_root).count(),
                  reps=1)
            timed("ann_ivf_join_big",
                  lambda: ann_ivf_join(emb_root).count(), reps=1)
        except ImportError:
            pass

    # the engine's costliest iterative op, on the NOTES.md validation
    # graph (seeded, cached; generation untimed). Round-2 baseline:
    # 325.6s at 1M edges / 32 cpus; round-3 contraction rewrite ~10s.
    cc_edges = int(os.environ.get("GRAFT_CC_EDGES", "1000000"))
    if cc_edges > 0 and (only is None
                         or only in ("cc_components", "pagerank",
                                     "pagerank_actor", "triangles")):
        try:
            from kg_covid_19_ray.sources.graphgen import write_edges_parquet
            from kg_covid_19_ray.stages.cluster import connected_components
            from kg_covid_19_ray.stages.pagerank import pagerank_fixed_point
            cc_path = f"/tmp/kg_ray_bench/cc_edges_{cc_edges}.parquet"
            if not os.path.exists(cc_path):
                write_edges_parquet(cc_path, cc_edges)
            if only is None or only == "cc_components":
                timed("cc_components",
                      lambda: connected_components(
                          ray.data.read_parquet(cc_path)).count(), reps=1)
            # the second iterative graph op on the same cached graph:
            # 3 exact-integer iterations, 2 bucketed exchanges each
            if only is None or only == "pagerank":
                timed("pagerank",
                      lambda: pagerank_fixed_point(
                          ray.data.read_parquet(cc_path), "a", "b",
                          iterations=3, plan="dataset").count(), reps=1)
            # same graph through the bucket-pinned actor plan: edges
            # ship once, iterations exchange only contribution sums
            if only is None or only == "pagerank_actor":
                timed("pagerank_actor",
                      lambda: pagerank_fixed_point(
                          ray.data.read_parquet(cc_path), "a", "b",
                          iterations=3, plan="actor").count(), reps=1)
            if only is None or only == "triangles":
                from kg_covid_19_ray.stages.triangles import count_triangles
                timed("triangles",
                      lambda: int(count_triangles(
                          ray.data.read_parquet(cc_path), "a", "b")
                          .to_pandas()["n_triangles"][0]), reps=1)
        except ImportError:
            pass

    # dedup/cleaning at scale: expand documents to ~1M rows with
    # controlled duplicate structure (sources/docgen) and run the
    # training-data suite on it — the proof these operators aren't
    # 5000-row toys. Generation is untimed and cached on disk.
    doc_replicas = int(os.environ.get("GRAFT_DOC_REPLICAS", "200"))
    if doc_replicas > 0 and (only is None or only.endswith("_big")):
        try:
            from kg_covid_19_ray.sources.docgen import \
                write_documents_parquet
            from kg_covid_19_ray.pipelines.dedup_ops import (
                exact_dedup, minhash_near_dups)
            from kg_covid_19_ray.pipelines.textops import clean_corpus
            tag = os.path.basename(os.path.normpath(sf_dir))
            big_root = f"/tmp/kg_ray_bench/docs_{tag}_x{doc_replicas}"
            big_table = os.path.join(big_root, "documents.parquet")
            if not os.path.isdir(big_table):
                write_documents_parquet(sf_dir, big_table,
                                        replicas=doc_replicas)
            extras["docs_big"] = ray.data.read_parquet(big_table).count()
            timed("dedup_exact_big",
                  lambda: exact_dedup(big_root).count(), reps=1)
            timed("text_clean_big",
                  lambda: clean_corpus(big_root).count(), reps=1)
            # round-4 quality/decontamination ops at 1M docs: the
            # benchmark-gram window scan and the unigram-surprisal
            # score (freq side table built from the corpus itself)
            from kg_covid_19_ray.pipelines.textops import (
                text_decontaminate, text_lm_surprisal)
            timed("text_decon_big",
                  lambda: text_decontaminate(big_root).count(), reps=1)
            # bloom-prefilter plan forced (the larger-than-heap
            # eval-suite path): candidates only through the verify join
            timed("text_decon_bloom_big",
                  lambda: text_decontaminate(
                      big_root, broadcast_max=0).count(), reps=1)
            timed("text_surprisal_big",
                  lambda: text_lm_surprisal(big_root).count(), reps=1)
            # join-based verification: the web-scale path (no driver
            # holds the corpus; candidates hash-join against documents)
            timed("dedup_minhash_big",
                  lambda: minhash_near_dups(big_root,
                                            verify="join").count(),
                  reps=1)
            # round-5 web-corpus ops at 1M docs: URL canonical dedup
            # and CCNet-style line-level boilerplate removal (three
            # bucketed exchanges incl. per-doc reassembly)
            from kg_covid_19_ray.pipelines.webops import (text_line_dedup,
                                                          web_url_dedup)
            timed("url_dedup_big",
                  lambda: web_url_dedup(big_root).count(), reps=1)
            timed("line_dedup_big",
                  lambda: text_line_dedup(big_root).count(), reps=1)
            # Gopher-rule quality filter: pure streaming map, the
            # floor for what a single-pass text op should cost
            from kg_covid_19_ray.pipelines.webops import \
                text_quality_filter
            timed("quality_filter_big",
                  lambda: text_quality_filter(big_root).count(), reps=1)
            # DSIR importance sampling: one corpus freq pass + one
            # scored pass + partial top-k (big corpus has no lang
            # column; the target domain is one source shard)
            from kg_covid_19_ray.pipelines.textops import \
                text_importance_sample
            timed("importance_big",
                  lambda: text_importance_sample(
                      big_root, target_col="source",
                      target_val="src0").count(), reps=1)
            # CCNet-tercile percentile over the same 1M-doc corpus
            # (surprisal pass + value-range-bounded histogram + rank)
            from kg_covid_19_ray.pipelines.textops import \
                text_quality_percentile
            timed("quality_pct_big",
                  lambda: text_quality_percentile(big_root).count(),
                  reps=1)
        except ImportError:
            pass

    ray.shutdown()

    headline = timings.get("kg_triples") or timings.get("kg_build", 0.0)
    result = {
        "metric": "flagship_kg_triples_seconds",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows_in": n_pages,
        **extras,
    }
    if headline and extras.get("triples_out"):
        result["triples_per_sec"] = round(extras["triples_out"] / headline, 1)
        result["pages_per_sec"] = round(n_pages / headline, 1)
    return result


def run_scaling(sf_dir: str) -> dict:
    """Same headline job at two parallelism levels in FRESH processes —
    the sandbox stand-in for N vs 4N nodes (BASELINE.md protocol)."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SF_DIR=sf_dir, BENCH_ONLY="kg_triples",
                   BENCH_REPS="1")  # min-of-2 FRESH processes instead
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Two N-vs-4N pairs, four fresh runs total. The PROTOCOL pair
    # (default 4->16) leaves headroom under the machine's 32 hardware
    # threads, so it measures the pipeline's scaling rather than
    # contention with Ray's own system processes; the 8->32 pair is
    # reported alongside because 32 is the driver's bench config (its
    # tail includes the known full-subscription raylet/driver
    # contention — see BASELINE.md).
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    lo2 = int(os.environ.get("GRAFT_SCALE_LO2", "8"))
    hi2 = int(os.environ.get("GRAFT_SCALE_HI2", "32"))
    # best-of-N fresh runs per level: single runs on a shared box swing
    # tens of percent (page cache, raylet teardown overlap), which can
    # make a 4-run sweep report superlinear nonsense; min-of-2 is the
    # cheapest stable estimator of the machine's true capability
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
    levels = sorted({lo, hi, lo2, hi2})
    runs = {}
    for n in levels:
        best = None
        for _ in range(reps):
            r = run(n)
            if best is None or r["value"] < best["value"]:
                best = r
        runs[n] = best

    def eff(a: int, b: int) -> float:
        return round((runs[a]["value"] / runs[b]["value"]) / (b / a), 3)

    return {
        "metric": "scaling_efficiency",
        "value": eff(lo, hi),
        "unit": "ratio",
        "cpus": [lo, hi],
        "pairs": {f"{lo}->{hi}": eff(lo, hi), f"{lo2}->{hi2}": eff(lo2, hi2)},
        "sec": {str(n): runs[n]["value"] for n in levels},
        "pages_per_sec": {str(n): runs[n].get("pages_per_sec")
                          for n in levels},
        "triples_per_sec": {str(n): runs[n].get("triples_per_sec")
                            for n in levels},
        "sf": sf_dir,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
        return
    only = os.environ.get("BENCH_ONLY") or None
    print(json.dumps(run_bench(sf_dir, num_cpus, only=only)))


if __name__ == "__main__":
    main()
