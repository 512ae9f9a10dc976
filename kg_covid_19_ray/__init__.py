"""kg_covid_19_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the *architecture* of
Knowledge-Graph-Hub/kg-covid-19 (reference at /root/reference, citations
as ``file:line`` in docstrings throughout): transform-then-merge KG
construction — per-document mention detection, CURIE
normalization/canonicalization, first-wins dedup, merged KGX node/edge
tables — expressed as streaming ``ray.data.Dataset`` pipelines over
Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.

Design rules (see SURVEY.md):
- every per-record loop of the reference becomes a vectorized
  ``map_batches`` stage over Arrow batches;
- every load-once lookup dict (reference ``Transform.__init__``) becomes
  actor-pool ``__init__`` state or a broadcast ``ray.put`` handle;
- every ``seen``-set dedup (reference first-wins) becomes a
  hash-partitioned ``groupby`` with an explicit deterministic order key;
- nothing materializes the full dataset mid-pipeline.

This package never calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
